"""Device mesh + sharded train-step builders.

The reference is single-process, single-device (utils/helpers.py:33-36,
main.py:183) — its scale-out story is shell-level `&` fan-out of independent
runs (bin/train_all.sh). This module is the TPU-native replacement: a
`jax.sharding.Mesh` over the chips, data-parallel batch sharding under one
jitted step, with XLA emitting the gradient `psum` and the latent-stat
all-gather that btcvae's (B, B, D) pairwise estimator needs over ICI.

Axis layout:
- `data`: batch dimension. The only axis a ~500K-param conv VAE needs.
- `model`: declared but size-1 by default — the mesh hook for TP. The
  largest tensor in the Burgess stack is 256x512, far below where sharding
  params pays for its collectives; keeping the axis in the mesh means
  turning TP on is a sharding-rule change, not a rewrite.

Everything here is GSPMD-style: the step function is written over GLOBAL
arrays; `jax.jit` + `NamedSharding` annotations drive partitioning, and XLA
inserts the collectives. No per-device code, no explicit psum.
"""



import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(n_devices=None, devices=None, model_parallel=1):
    """Build a ('data', 'model') mesh over the available chips.

    `n_devices` limits how many devices are used (default: all). `data` gets
    every device not claimed by `model_parallel`.
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if n % model_parallel != 0:
        raise ValueError("{} devices not divisible by model_parallel={}"
                         .format(n, model_parallel))
    dev_array = np.asarray(devices).reshape(n // model_parallel,
                                            model_parallel)
    return Mesh(dev_array, ("data", "model"))


def replicate(mesh):
    """Sharding that replicates a pytree across the mesh."""
    return NamedSharding(mesh, P())


def batch_sharding(mesh):
    """Sharding that splits the leading (batch) dim over the 'data' axis."""
    return NamedSharding(mesh, P("data"))


def shard_batch(batch, mesh):
    """Place a host batch onto the mesh, split over 'data'."""
    return jax.device_put(batch, batch_sharding(mesh))


def pad_to_multiple(batch, multiple):
    """Pad the batch's leading dim up to `multiple` by repeating the first
    element; returns (padded, true_size). Sharded dims must divide the mesh
    axis; losses that depend on batch size (MSS weights) must be given
    `true_size`."""
    b = batch.shape[0]
    rem = b % multiple
    if rem == 0:
        return batch, b
    pad = np.repeat(batch[:1], multiple - rem, axis=0)
    return np.concatenate([batch, pad], axis=0), b


def _state_shardings(mesh, state):
    """Replicated state shardings, except: when the mesh has a real 'model'
    axis and a state pytree is given, the FactorVAE discriminator's hidden
    weights go column-parallel (see tp_state_shardings)."""
    if state is not None and mesh.shape.get("model", 1) > 1:
        return tp_state_shardings(mesh, state)
    return replicate(mesh)


def make_sharded_train_step(step_fn, mesh, donate=True, state=None):
    """Wrap a (state, batch) -> (state, metrics) step for the mesh.

    State (params, both Adam moments, RNG, step counter) is replicated —
    or TP-sharded via `state` when the mesh has a 'model' axis > 1; the
    batch is split over 'data'. XLA's SPMD partitioner derives every
    internal sharding from these annotations: per-shard forward/backward,
    gradient all-reduce over ICI, and the (B, D) -> (B, B, D) all-gather
    inside btcvae.
    """
    st = _state_shardings(mesh, state)
    rep = replicate(mesh)
    bsh = batch_sharding(mesh)
    return jax.jit(step_fn,
                   in_shardings=(st, bsh),
                   out_shardings=(st, rep),
                   donate_argnums=(0,) if donate else ())


def make_sharded_padded_train_step(step_fn, mesh, donate=True, state=None):
    """Sharded (state, padded_batch, n_valid) -> (state, metrics) step: the
    batch (padded so its leading dim divides the 'data' axis) is sharded,
    `n_valid` (the true batch size) is a replicated traced scalar feeding
    the mask-aware losses."""
    st = _state_shardings(mesh, state)
    rep = replicate(mesh)
    bsh = batch_sharding(mesh)
    return jax.jit(step_fn,
                   in_shardings=(st, bsh, rep),
                   out_shardings=(st, rep),
                   donate_argnums=(0,) if donate else ())


def make_sharded_multi_train_step(multi_fn, mesh, donate=True, state=None):
    """Sharded K-step super-step: batches are (K, B, ...) with B split over
    'data' (scan iterates the leading axis; each scanned batch keeps the
    per-step sharding)."""
    st = _state_shardings(mesh, state)
    rep = replicate(mesh)
    bsh = NamedSharding(mesh, P(None, "data"))
    return jax.jit(multi_fn,
                   in_shardings=(st, bsh),
                   out_shardings=(st, rep),
                   donate_argnums=(0,) if donate else ())


def tp_state_shardings(mesh, state):
    """Parameter shardings with the FactorVAE discriminator's 1000-unit
    hidden layers split over the 'model' axis (column-parallel weights).

    The Burgess VAE itself (~500K params, largest tensor 512x256) is far too
    small for TP to pay — its params stay replicated. With
    model_parallel == 1 this degenerates to full replication, so it is
    always safe to pass. XLA/GSPMD derives the matching activation
    shardings and inserts the collectives.
    """
    rep = replicate(mesh)
    col = NamedSharding(mesh, P(None, "model"))

    def rule(path, leaf):
        keys = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        if "disc_params" in keys and "w" in keys and leaf.ndim == 2 \
                and leaf.shape[1] % mesh.shape["model"] == 0:
            return col
        return rep

    return jax.tree_util.tree_map_with_path(rule, state)


def make_tp_train_step(step_fn, mesh, state, donate=True):
    """Sharded step with tensor-parallel discriminator params: state leaves
    follow tp_state_shardings, batch splits over 'data'."""
    st_sh = tp_state_shardings(mesh, state)
    bsh = batch_sharding(mesh)
    rep = replicate(mesh)
    return jax.jit(step_fn,
                   in_shardings=(st_sh, bsh),
                   out_shardings=(st_sh, rep),
                   donate_argnums=(0,) if donate else ())
