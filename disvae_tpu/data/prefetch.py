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

    With `pad_multiple` (the mesh's data-axis size), a ragged batch whose
    leading dim does not divide it is host-padded up to the next multiple
    (repeating row 0) BEFORE the sharded device_put — jax.device_put with a
    P('data') sharding rejects indivisible batches. Such batches are yielded
    as ``((device_array, true_size), labels)`` so the consumer can run the
    mask-aware (loss-exact) padded step; they are never stacked into
    superbatches.
    """

    def __init__(self, loader, depth=2, sharding=None, superbatch_k=1,
                 super_sharding=None, pad_multiple=None, multihost=False):
        self.loader = loader
        self.depth = depth
        self.sharding = sharding
        self.superbatch_k = superbatch_k
        self.super_sharding = super_sharding
        self.pad_multiple = pad_multiple
        # Multi-host: the loader yields only this process's rows of each
        # global batch (DataLoader.host_slice); assemble the global sharded
        # array from the local shard instead of device_put'ing a (here
        # unavailable) global batch.
        self.multihost = multihost

    def __len__(self):
        return len(self.loader)

    @property
    def dataset(self):
        return self.loader.dataset

    def _put(self, x, sharding):
        if self.multihost and sharding is not None:
            return jax.make_array_from_process_local_data(sharding, x)
        return jax.device_put(x, sharding) if sharding is not None \
            else jax.device_put(x)

    def __iter__(self):
        q = queue.Queue(maxsize=self.depth)
        stop = threading.Event()  # consumer gone: worker must not block
        _END = object()
        k = self.superbatch_k

        def put(item):
            """Bounded put that gives up once the consumer abandoned
            iteration — otherwise a break/exception mid-epoch would leave
            the worker blocked forever on a full queue, leaking the thread
            and the device buffers it holds."""
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def flush(group):
            if len(group) == k and k > 1:
                imgs = np.stack([g[0] for g in group])
                labels = np.stack([g[1] for g in group])
                return put((self._put(imgs, self.super_sharding), labels))
            for imgs, labels in group:
                if not put((self._put(imgs, self.sharding), labels)):
                    return False
            return True

        # Multi-host: every host-local batch arrives pre-padded to an equal
        # share of the (globally padded) batch by DataLoader(pad_global_to=
        # data-axis); raggedness and the valid-row count are properties of
        # the GLOBAL batch, so both come from the loader's global structure
        # — the local share size would be wrong (and per-host divergent).
        global_sizes = None
        if self.multihost and self.pad_multiple \
                and getattr(self.loader, "pad_global_to", None):
            global_sizes = getattr(self.loader, "global_batch_sizes",
                                   lambda: None)()

        def worker():
            try:
                group = []
                for bi, (imgs, labels) in enumerate(self.loader):
                    if stop.is_set():
                        return
                    if global_sizes is not None:
                        true_n = global_sizes[bi]
                        if true_n % self.pad_multiple:
                            if group:
                                if not flush(group):
                                    return
                                group = []
                            item = ((self._put(imgs, self.sharding),
                                     true_n), labels)
                            if not put(item):
                                return
                            continue
                    elif self.pad_multiple \
                            and imgs.shape[0] % self.pad_multiple:
                        from disvae_tpu.parallel.mesh import pad_to_multiple
                        padded, true_n = pad_to_multiple(imgs,
                                                         self.pad_multiple)
                        if group:
                            if not flush(group):
                                return
                            group = []
                        item = ((self._put(padded, self.sharding), true_n),
                                labels)
                        if not put(item):
                            return
                        continue
                    if k <= 1:
                        if not put((self._put(imgs, self.sharding), labels)):
                            return
                        continue
                    if group and group[0][0].shape != imgs.shape:
                        if not flush(group):
                            return
                        group = []
                    group.append((imgs, labels))
                    if len(group) == k:
                        if not flush(group):
                            return
                        group = []
                if group:
                    if not flush(group):
                        return
            except BaseException as e:  # surface worker errors to consumer
                put(e)
                return
            put(_END)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is _END:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
