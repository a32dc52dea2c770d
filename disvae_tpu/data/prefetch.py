"""Host -> HBM input prefetching.

The reference leans on torch DataLoader workers (default num_workers=0, i.e.
none — reference datasets.py:49-71). Here the device-feed path is explicit:
a background thread assembles batches (memmap gather + uint8->f32 scale) and
`jax.device_put`s them ahead of the training loop, so the chip never waits on
host IO and the host never waits on the chip (JAX dispatch is already async;
this removes the remaining host-side batch-assembly bubble).
"""

import queue
import threading

import jax


class DevicePrefetcher:
    """Iterate a DataLoader with `depth` batches in flight on device.

    Wraps any iterable yielding (images, labels) numpy pairs. Labels stay on
    host (the train step never consumes them). Exceptions in the worker are
    re-raised at the consuming site.
    """

    def __init__(self, loader, depth=2, sharding=None):
        self.loader = loader
        self.depth = depth
        self.sharding = sharding

    def __len__(self):
        return len(self.loader)

    @property
    def dataset(self):
        return self.loader.dataset

    def __iter__(self):
        q = queue.Queue(maxsize=self.depth)
        _END = object()

        def worker():
            try:
                for imgs, labels in self.loader:
                    if self.sharding is not None:
                        dev = jax.device_put(imgs, self.sharding)
                    else:
                        dev = jax.device_put(imgs)
                    q.put((dev, labels))
            except BaseException as e:  # surface worker errors to consumer
                q.put(e)
                return
            q.put(_END)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is _END:
                break
            if isinstance(item, BaseException):
                raise item
            yield item
