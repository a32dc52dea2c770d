"""Compiled train/eval step builders — one fused XLA program per loss family.

This replaces the reference's per-iteration Python orchestration
(disvae/training.py:137-164: forward -> loss -> zero_grad -> backward -> step,
with a ValueError-driven fallback into FactorVAE's dual-optimizer path at
losses.py:243-313). Here each family gets a single jitted function
(state, batch) -> (state, metrics) with donated state buffers; XLA fuses the
whole update including both optimizers for FactorVAE.

Sharding: steps take an optional mesh. Params/opt state are replicated, the
batch is sharded over the 'data' axis; XLA inserts the gradient psum and the
latent-stat all-gather that btcvae's pairwise matrix needs.
"""

from functools import partial

import jax
import jax.numpy as jnp
import optax

from disvae_tpu.ops import losses as L


def make_optimizer(lr):
    """Adam with torch defaults (betas 0.9/0.999, eps 1e-8) as in main.py:208.

    Wrapped in optax.flatten: the Burgess stack is 28 small tensors, and
    running Adam per-tensor costs more in kernel launches than in FLOPs —
    flattening runs the whole update as one fused vector op (measured 1.7x
    step-time win on v5e at b256)."""
    return optax.flatten(optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8))


def make_disc_optimizer(loss_cfg):
    """Discriminator Adam with betas (0.5, 0.9) (reference losses.py:232-238)."""
    b1, b2 = loss_cfg.disc_betas
    return optax.flatten(optax.adam(loss_cfg.lr_disc, b1=b1, b2=b2,
                                    eps=1e-8))


def make_train_step(model, loss_cfg, optimizer, disc=None,
                    disc_optimizer=None, donate=True, mesh=None, state=None):
    """Build the jitted training step for `loss_cfg`. With a mesh, the step
    is compiled SPMD: state replicated (or TP-sharded when `state` is given
    and the mesh has a 'model' axis > 1), batch sharded over the 'data' axis
    (see disvae_tpu/parallel/mesh.py)."""
    if loss_cfg.needs_discriminator:
        assert disc is not None and disc_optimizer is not None
        step_fn = partial(_factor_train_step, model, loss_cfg, optimizer,
                          disc, disc_optimizer)
    else:
        step_fn = partial(_standard_train_step, model, loss_cfg, optimizer)
    if mesh is not None:
        from disvae_tpu.parallel.mesh import make_sharded_train_step
        return make_sharded_train_step(step_fn, mesh, donate=donate,
                                       state=state)
    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def make_padded_train_step(model, loss_cfg, optimizer, disc=None,
                           disc_optimizer=None, donate=True, mesh=None,
                           state=None):
    """Jitted step for PADDED ragged batches:
    (state, batch, n_valid) -> (state, metrics), where `batch` has been
    host-padded so its leading dim divides the mesh's data axis and the
    traced scalar `n_valid` is the true (pre-pad) batch size. Every
    batch-size-dependent quantity — reconstruction/KL means, the MSS
    importance weights, FactorVAE's half split — is computed at `n_valid`
    (see ops/losses.py masked paths). For the non-adversarial losses the
    result matches the unpadded step exactly; for FactorVAE it matches in
    DISTRIBUTION only — the masked permute_dims draws a different
    permutation realization, so discrim_loss and the discriminator grads
    differ while the VAE-side loss terms still agree (this is why
    test_padded_step_matches_unpadded excludes discrim_loss). Compiled once
    per padded shape; only the final batch of an epoch ever uses it."""
    if loss_cfg.needs_discriminator:
        assert disc is not None and disc_optimizer is not None
        step_fn = partial(_factor_train_step, model, loss_cfg, optimizer,
                          disc, disc_optimizer)
    else:
        step_fn = partial(_standard_train_step, model, loss_cfg, optimizer)
    if mesh is not None:
        from disvae_tpu.parallel.mesh import make_sharded_padded_train_step
        return make_sharded_padded_train_step(step_fn, mesh, donate=donate,
                                              state=state)
    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def make_eval_step(model, loss_cfg, disc=None):
    """Build the jitted evaluation step: batch -> metrics (no updates).

    Eval-mode semantics from the reference: reparameterize returns the mean
    (vae.py:65-71 with model.eval()), annealing factors are at their final
    value (losses.py:146-147,194-195), and FactorVAE evaluates only the first
    half-batch and skips the discriminator loss (losses.py:276-278).

    `coefs` is the traced hyperparameter vector (ops/losses.py
    coef_vector), so sweep processes share the compiled eval program too.
    """
    if loss_cfg.needs_discriminator:
        def eval_fn(params, disc_params, batch, coefs=None):
            batch = _decompress_batch(batch, model.img_size)
            half = batch.shape[0] // 2
            data1 = batch[:half]
            recon, latent_dist, z = model.apply(params, data1, rng=None,
                                                is_train=False)
            d_z = disc.apply(disc_params, z)
            _, metrics = loss_cfg.eval_losses(data1, recon, latent_dist, d_z,
                                              is_train=False, step=0,
                                              coefs=coefs)
            return metrics
        return jax.jit(eval_fn)

    def eval_fn(params, disc_params, batch, coefs=None):
        del disc_params
        batch = _decompress_batch(batch, model.img_size)
        recon, latent_dist, z = model.apply(params, batch, rng=None,
                                            is_train=False)
        _, metrics = loss_cfg(batch, recon, latent_dist, False, 0,
                              latent_sample=z, coefs=coefs)
        return metrics
    return jax.jit(eval_fn)


def _decompress_batch(batch, img_size=None):
    """Wire-format batches decompress on device — static trace-time
    branches, so float feeds compile to a no-op.

    * uint8 (B, H, W, C): intensity = value / 255 (get_batch_raw)
    * uint8 (B, n_pixels/8): bitpacked binary images (get_batch_bits);
      `img_size` (C, H, W) gives the unpacked shape
    """
    if batch.dtype != jnp.uint8:
        return batch
    if batch.ndim == 2:  # bitpacked
        assert img_size is not None, "bit feed needs the model's img_size"
        c, h, w = img_size
        bits = jnp.bitwise_and(
            batch[:, :, None] >> jnp.arange(7, -1, -1, dtype=jnp.uint8), 1)
        return bits.reshape(batch.shape[0], h, w, c).astype(jnp.float32)
    return batch.astype(jnp.float32) * (1.0 / 255.0)


def _standard_train_step(model, loss_cfg, optimizer, state, batch,
                         n_valid=None):
    batch = _decompress_batch(batch, model.img_size)
    step = state.step + 1  # incremented before use, like _pre_call
    rng, rng_reparam = jax.random.split(state.rng)

    def loss_fn(params):
        recon, latent_dist, z = model.apply(params, batch, rng_reparam,
                                            is_train=True)
        return loss_cfg(batch, recon, latent_dist, True, step,
                        latent_sample=z, n_valid=n_valid, coefs=state.coefs)

    (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params)
    updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    new_state = state.replace(params=params, opt_state=opt_state, step=step,
                              rng=rng)
    return new_state, metrics


def _factor_train_step(model, loss_cfg, optimizer, disc, disc_optimizer,
                       state, batch, n_valid=None):
    """FactorVAE step. One jax.grad over the surrogate scalar reproduces the
    reference's grad flow for both parameter sets; both updates are computed
    from the pre-step parameters and applied together, matching the
    end-of-iteration optimizer.step()/optimizer_d.step() ordering
    (losses.py:306-308)."""
    batch = _decompress_batch(batch, model.img_size)
    step = state.step + 1
    rng, rng_loss = jax.random.split(state.rng)

    def loss_fn(params, disc_params):
        return L.factor_surrogate(loss_cfg, model, disc, params, disc_params,
                                  batch, rng_loss, step, is_train=True,
                                  n_valid=n_valid, coefs=state.coefs)

    grad_fn = jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)
    (_, metrics), (grads, disc_grads) = grad_fn(state.params,
                                                state.disc_params)

    updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    d_updates, disc_opt_state = disc_optimizer.update(
        disc_grads, state.disc_opt_state, state.disc_params)
    disc_params = optax.apply_updates(state.disc_params, d_updates)

    new_state = state.replace(params=params, opt_state=opt_state, step=step,
                              rng=rng, disc_params=disc_params,
                              disc_opt_state=disc_opt_state)
    return new_state, metrics


def make_resident_multi_train_step(model, loss_cfg, optimizer, disc=None,
                                   disc_optimizer=None, donate=True,
                                   mesh=None, state=None):
    """K-step super-step over an HBM-RESIDENT dataset:
    (state, data, idx) -> (state, metrics), data = the full wire-format
    dataset living on device, idx = (K, B) int32 batch indices.

    Motivation: on hosts with thin host->device links (the axon tunnel
    measures ~32 MB/s; even PCIe is the usual bottleneck for uint8 image
    streams) the per-epoch transfer dominates wall-clock. The datasets this
    framework trains on fit HBM in wire format (dsprites bitpacked 378 MB,
    celeba uint8 2.4 GB vs 16 GB HBM), so the pipeline ships the dataset
    ONCE and afterwards only the epoch permutation (~1 MB): each scanned
    step gathers its batch with jnp.take straight out of HBM (~TB/s).

    Under a mesh, `data` stays replicated and the gathered batch is
    re-sharded over the 'data' axis via with_sharding_constraint, so the
    step itself runs exactly like the streaming DP path.
    """
    if loss_cfg.needs_discriminator:
        assert disc is not None and disc_optimizer is not None
        step_fn = partial(_factor_train_step, model, loss_cfg, optimizer,
                          disc, disc_optimizer)
    else:
        step_fn = partial(_standard_train_step, model, loss_cfg, optimizer)

    constraint = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        constraint = NamedSharding(mesh, P("data"))

    def multi(state, data, idx):
        def body(st, i):
            batch = jnp.take(data, i, axis=0)
            if constraint is not None:
                batch = jax.lax.with_sharding_constraint(batch, constraint)
            return step_fn(st, batch)
        return jax.lax.scan(body, state, idx)

    if mesh is not None:
        from disvae_tpu.parallel.mesh import _state_shardings, replicate
        # TP-aware state shardings (matches the single/padded step builders
        # — forcing replication here would reshard a column-parallel
        # FactorVAE discriminator every epoch under --model-parallel > 1)
        st = _state_shardings(mesh, state)
        rep = replicate(mesh)
        return jax.jit(multi, in_shardings=(st, rep, rep),
                       out_shardings=(st, rep),
                       donate_argnums=(0,) if donate else ())
    return jax.jit(multi, donate_argnums=(0,) if donate else ())


def stack_metrics(metrics, key_order):
    """Pack a metrics dict into one f32 array in canonical key order (one
    device buffer per step instead of ~16). Scalar metrics give (n_keys,);
    per-scan-step (K,) metrics give (K, n_keys)."""
    return jnp.stack([metrics[k] for k in key_order], axis=-1)


def make_multi_train_step(model, loss_cfg, optimizer, disc=None,
                          disc_optimizer=None, donate=True, mesh=None,
                          state=None):
    """Build a jitted K-step training super-step:
    (state, batches (K, B, ...)) -> (state, metrics dict of (K,) arrays).

    lax.scan keeps the whole K-step loop on device — one dispatch and one
    host round-trip per K batches instead of per batch. K is not baked in;
    it is read from the input shape, so one compiled program serves any
    superbatch with the same (B, H, W, C).
    """
    if loss_cfg.needs_discriminator:
        assert disc is not None and disc_optimizer is not None
        step_fn = partial(_factor_train_step, model, loss_cfg, optimizer,
                          disc, disc_optimizer)
    else:
        step_fn = partial(_standard_train_step, model, loss_cfg, optimizer)

    def multi(state, batches):
        return jax.lax.scan(step_fn, state, batches)

    if mesh is not None:
        from disvae_tpu.parallel.mesh import make_sharded_multi_train_step
        return make_sharded_multi_train_step(multi, mesh, donate=donate,
                                             state=state)
    return jax.jit(multi, donate_argnums=(0,) if donate else ())
