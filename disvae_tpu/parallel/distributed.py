"""Multi-host (multi-slice) initialization.

The reference is strictly single-process (SURVEY.md section 2: no
torch.distributed anywhere); the TPU-native scale-out story is: one Python
process per host, `jax.distributed.initialize` to form the global runtime,
then the SAME mesh/pjit code from disvae_tpu.parallel.mesh — GSPMD sees the
global device set, collectives ride ICI within a slice and DCN across
slices with no code change.

Typical use at the top of a training script:

    from disvae_tpu.parallel import distributed, mesh
    distributed.initialize()            # no-op on a single host
    m = mesh.create_mesh()              # all global devices
    ... Trainer(..., mesh=m)

Each host feeds only its share of every global batch. The ACTUAL feeding
contract lives in the data pipeline, not here:
`DataLoader(host_slice=(process_index, process_count),
pad_global_to=<data-axis size>)` pads each global batch's index list to the
data-axis multiple and splits it into equal contiguous per-host shares
(identical (seed, epoch)-keyed permutation on every host, pad rows at the
global end, true sizes from `global_batch_sizes()`); `main.py` wires this
automatically when `jax.process_count() > 1`. `local_batch_slice` below is
a simpler divisible-batch helper kept for library callers that manage
their own feeding; it does NOT handle ragged batches.
"""

import logging

import jax

logger = logging.getLogger(__name__)


def initialize(coordinator_address=None, num_processes=None, process_id=None):
    """Form the global JAX runtime across hosts.

    With no arguments this auto-detects from the TPU environment variables
    (the normal path on Cloud TPU pods). On a single host it is a no-op, so
    scripts can call it unconditionally. Idempotent: if the runtime is
    already initialized (e.g. a launcher called jax.distributed.initialize
    itself, as tools/multihost_run.py does), this detects it and returns.

    The already-initialized probe reads jax.distributed's client handle, NOT
    jax.process_count(): process_count() initializes the XLA backend, after
    which jax.distributed.initialize raises ("must be called before any JAX
    calls") on every rank that actually needed it.
    """
    from jax._src import distributed as _jax_distributed

    if _jax_distributed.global_state.client is not None:
        logger.info("distributed runtime already initialized: "
                    "process %d/%d", jax.process_index(),
                    jax.process_count())
        return jax.process_count() > 1
    if num_processes is None and coordinator_address is None:
        try:
            jax.distributed.initialize()
        except (ValueError, RuntimeError) as e:
            logger.info("single-process run (jax.distributed: %s)", e)
            return False
    else:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    logger.info("distributed: process %d/%d, %d local / %d global devices",
                jax.process_index(), jax.process_count(),
                jax.local_device_count(), jax.device_count())
    return jax.process_count() > 1


def barrier(name):
    """Block until every process reaches this point (no-op single-process).
    Used to order host-side filesystem effects across ranks — e.g. rank 0
    archives/creates the results dir before other ranks touch it, and no
    rank exits while another still has collective work in flight."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices(name)


def is_writer():
    """True on the single rank (process 0) that owns all artifact writes.

    On a multi-host run every rank computes the same replicated state, so
    rank 0 alone writes `results/<name>/` — concurrent writers would race
    on the same files whenever the results dir lives on a shared
    filesystem. NOTE the flip side: `--resume` on multi-host requires that
    shared filesystem, since every rank reads the checkpoint rank 0 wrote.
    """
    return jax.process_index() == 0


def local_batch_slice(global_batch_size):
    """(start, stop) rows of the global batch this host is responsible for
    feeding. Data loaders on each host slice their permutation with this so
    the union of host feeds is exactly the global batch."""
    n = jax.process_count()
    i = jax.process_index()
    per = global_batch_size // n
    if global_batch_size % n:
        raise ValueError("global batch {} not divisible by {} hosts".format(
            global_batch_size, n))
    return i * per, (i + 1) * per
