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
import numpy as np


class DevicePrefetcher:
    """Iterate a DataLoader with `depth` batches in flight on device.

    Wraps any iterable yielding (images, labels) numpy pairs. Labels stay on
    host (the train step never consumes them). Exceptions in the worker are
    re-raised at the consuming site.

    With `superbatch_k > 1`, runs of `k` equal-shaped batches are stacked
    into one (k, B, ...) array per transfer — the input format of the
    lax.scan super-step (train/steps.py make_multi_train_step). Ragged
    leftovers (end of epoch, partial final batch) come through unstacked as
    plain (B, ...) batches; consumers distinguish the two by ndim.
    """

    def __init__(self, loader, depth=2, sharding=None, superbatch_k=1,
                 super_sharding=None):
        self.loader = loader
        self.depth = depth
        self.sharding = sharding
        self.superbatch_k = superbatch_k
        self.super_sharding = super_sharding

    def __len__(self):
        return len(self.loader)

    @property
    def dataset(self):
        return self.loader.dataset

    def _put(self, x, sharding):
        return jax.device_put(x, sharding) if sharding is not None \
            else jax.device_put(x)

    def __iter__(self):
        q = queue.Queue(maxsize=self.depth)
        _END = object()
        k = self.superbatch_k

        def flush(group):
            if len(group) == k and k > 1:
                imgs = np.stack([g[0] for g in group])
                labels = np.stack([g[1] for g in group])
                q.put((self._put(imgs, self.super_sharding), labels))
            else:
                for imgs, labels in group:
                    q.put((self._put(imgs, self.sharding), labels))

        def worker():
            try:
                group = []
                for imgs, labels in self.loader:
                    if k <= 1:
                        q.put((self._put(imgs, self.sharding), labels))
                        continue
                    if group and group[0][0].shape != imgs.shape:
                        flush(group)
                        group = []
                    group.append((imgs, labels))
                    if len(group) == k:
                        flush(group)
                        group = []
                if group:
                    flush(group)
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
