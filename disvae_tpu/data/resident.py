"""HBM-resident dataset: ship the wire-format images to device ONCE, feed
epochs by index.

Rationale: the streaming pipeline moves the whole dataset host->device every
epoch (celeba: 2.4 GB of uint8 wire per epoch). On hosts with a thin
host->device link that transfer dominates wall-clock — measured at
~32 MB/s on the axon-tunneled chip this framework is benched on, i.e.
~100x slower than the compute. Every dataset the reference trains on fits
HBM in wire format (mnist/fashion 0.5 MB, dsprites bitpacked 378 MB,
chairs 340 MB, celeba 2.4 GB vs 16 GB HBM on a v5e), so the TPU-native
answer is residency: one transfer, then each epoch ships only its ~1 MB
permutation and every batch is a jnp.take out of HBM at memory bandwidth.

The wire format matches the streaming path exactly (bitpacked rows for
binary datasets, scaled uint8 otherwise), so the jitted train step's
on-device decompress (train/steps.py _decompress_batch) is shared and the
fed pixel values are bit-identical to the streaming feed.
"""

import logging

import numpy as np

logger = logging.getLogger(__name__)

# Default residency budget: leave headroom on a 16 GB-HBM chip for params,
# activations, and the (B, B, D) btcvae intermediates.
DEFAULT_LIMIT_BYTES = 6_000_000_000


def wire_shape(dataset):
    """Shape of the dataset's wire-format array: (N, row_bytes) bitpacked
    rows for binary datasets, the raw (N, H, W, C) uint8 array otherwise.
    Single source of truth — ResidentData builds this shape and consumers
    (Evaluator's prebuilt-upload check) validate against it."""
    n = len(dataset)
    if getattr(dataset, "is_binary", False):
        c, h, w = dataset.img_size
        return (n, (h * w * c + 7) // 8)
    return tuple(dataset.imgs.shape)


def wire_nbytes(dataset):
    """Bytes the dataset occupies in wire format (bitpacked or uint8)."""
    return int(np.prod(wire_shape(dataset)))


class ResidentData:
    """The dataset's wire-format array, committed to device memory.

    `wire` is (N, n_bytes) uint8 for binary datasets (np.packbits rows) or
    (N, H, W, C) uint8 otherwise — exactly what DataLoader(raw=True) would
    stream. Under a mesh it is replicated (each chip holds the full set;
    batch gathers then re-shard over 'data' inside the step).
    """

    # One-time upload chunk: a single multi-GB device_put literal measured
    # 5x SLOWER than the same bytes in ~64 MB pieces on the tunneled chip
    # (6.4 vs ~32 MB/s); pieces also let the transfers pipeline.
    CHUNK_BYTES = 64 << 20

    def __init__(self, dataset, mesh=None):
        import jax
        import jax.numpy as jnp

        n = len(dataset)
        binary = bool(getattr(dataset, "is_binary", False))
        shape = wire_shape(dataset)
        row_bytes = int(np.prod(shape[1:]))
        mul = 1 if binary else int(round(255 * dataset._scale))

        def host_chunk(lo, hi):
            """Wire-format rows [lo, hi) — packed/scaled PER CHUNK, not
            upfront: the device_put of chunk i is async, so chunk i+1's
            packbits/copy overlaps the transfer, and the full-dataset
            intermediate (3 GB unpacked for dsprites) never materializes."""
            piece = np.asarray(dataset.imgs[lo:hi], np.uint8)
            if binary:
                return np.packbits(piece.reshape(hi - lo, -1), axis=1)
            if mul != 1:
                piece = (piece * mul).astype(np.uint8)
            return np.ascontiguousarray(piece)

        sharding = None
        if mesh is not None:
            from disvae_tpu.parallel.mesh import replicate
            sharding = replicate(mesh)
        rows_per_chunk = max(1, self.CHUNK_BYTES // max(1, row_bytes))
        # Preallocate-and-fill with a DONATED per-chunk update. The previous
        # device_put-all-chunks + jnp.concatenate transiently held ~2x the
        # wire bytes in HBM (all chunks + the concatenated copy); here the
        # peak is the final array + one in-flight chunk.
        from jax import lax

        def _upd(a, c, i):
            return lax.dynamic_update_slice_in_dim(a, c, i, axis=0)

        if sharding is not None:
            wire = jax.jit(lambda: jnp.zeros(shape, jnp.uint8),
                           out_shardings=sharding)()
            upd = jax.jit(_upd, donate_argnums=(0,),
                          out_shardings=sharding)
        else:
            wire = jax.jit(lambda: jnp.zeros(shape, jnp.uint8))()
            upd = jax.jit(_upd, donate_argnums=(0,))
        n_chunks = 0
        for i in range(0, n, rows_per_chunk):
            piece = host_chunk(i, min(n, i + rows_per_chunk))
            dev = jax.device_put(piece, sharding) if sharding is not None \
                else jax.device_put(piece)
            wire = upd(wire, dev, jnp.int32(i))
            n_chunks += 1
        self.wire = wire
        self.n = n
        logger.info("Resident dataset: %d images, %.0f MB wire in HBM "
                    "(%d-chunk upload).", n, n * row_bytes / 1e6, n_chunks)

    @classmethod
    def maybe(cls, dataset, mesh=None, limit_bytes=DEFAULT_LIMIT_BYTES):
        """Build residency if the dataset fits the budget and exposes a raw
        uint8 store; None otherwise (streaming pipeline takes over)."""
        imgs = getattr(dataset, "imgs", None)
        if imgs is None or getattr(imgs, "dtype", None) != np.uint8:
            return None
        if wire_nbytes(dataset) > limit_bytes:
            return None
        return cls(dataset, mesh=mesh)
