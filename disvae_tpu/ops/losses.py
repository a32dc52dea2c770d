"""The five VAE loss families as pure, jit-fusable functions.

TPU-native re-design of reference disvae/models/losses.py:17-544. Key
departures from the torch design, driven by XLA's compile-once model:

* Losses are frozen dataclasses (hashable -> jit-static). All run-time state
  the reference kept on the loss object (`n_train_steps` for annealing and
  record-every-50 gating, losses.py:105-114) becomes an explicit traced
  `step` scalar carried in the train state.
* Every loss returns ``(loss, metrics_dict)`` where metrics are traced
  scalars computed unconditionally — gating which steps get *recorded* is a
  host-side concern (see train/trainer.py), so there is no data-dependent
  control flow inside the compiled step.
* FactorVAE's two-optimizer, retain-graph backward dance (losses.py:281-308)
  is reformulated as a single differentiable scalar with stop_gradients
  placed so one jax.grad over (vae_params, disc_params) yields exactly the
  reference's update for both (see factor_surrogate below).
* Annealing uses traced jnp.minimum instead of Python min so `step` can be a
  tracer (reference linear_annealing at losses.py:511-518).
* Sweep-compile-once: the float hyperparameters a sweep varies (alpha /
  beta / gamma / C bounds) can enter the compiled program as a TRACED
  operand vector instead of baked constants. Each loss declares
  `coef_names`; `coef_vector(cfg)` packs the current values, the train
  state carries them, and `__call__(..., coefs=...)` reads them back. The
  emitted HLO is then identical across hyperparameter values, so
  bin/train_mutual_info.sh's per-alpha CLI processes hit the persistent
  compilation cache instead of paying a multi-minute XLA compile per value
  (measured 8.5 min for the resident whole-epoch program per alpha on the
  tunneled v5e). `coefs=None` (the default everywhere outside the train
  step) keeps the old constant-folding behavior.
"""

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from disvae_tpu.ops.math import (log_density_gaussian,
                                 log_importance_weight_matrix,
                                 log_importance_weight_matrix_masked,
                                 matrix_log_density_gaussian)

LOSSES = ["VAE", "betaH", "betaB", "factor", "btcvae"]
RECON_DIST = ["bernoulli", "laplace", "gaussian"]

# Matches the reference's BaseLoss(record_loss_every=50) default
# (losses.py:71): sub-losses are recorded when step % 50 == 1, where the
# step counter is incremented before the check.
RECORD_LOSS_EVERY = 50


def get_loss_f(loss_name, **kwargs_parse):
    """Build the loss config from argparse-style kwargs (reference
    losses.py:22-49). `device` is accepted and ignored (JAX arrays carry
    their own placement)."""
    kwargs_all = dict(rec_dist=kwargs_parse["rec_dist"],
                      steps_anneal=kwargs_parse["reg_anneal"])
    if loss_name == "betaH":
        return BetaHLoss(beta=kwargs_parse["betaH_B"], **kwargs_all)
    elif loss_name == "VAE":
        return BetaHLoss(beta=1, **kwargs_all)
    elif loss_name == "betaB":
        return BetaBLoss(C_init=kwargs_parse["betaB_initC"],
                         C_fin=kwargs_parse["betaB_finC"],
                         gamma=kwargs_parse["betaB_G"],
                         **kwargs_all)
    elif loss_name == "factor":
        return FactorKLoss(gamma=kwargs_parse["factor_G"],
                           latent_dim=kwargs_parse["latent_dim"],
                           lr_disc=kwargs_parse["lr_disc"],
                           **kwargs_all)
    elif loss_name == "btcvae":
        return BtcvaeLoss(n_data=kwargs_parse["n_data"],
                          alpha=kwargs_parse["btcvae_A"],
                          beta=kwargs_parse["btcvae_B"],
                          gamma=kwargs_parse["btcvae_G"],
                          **kwargs_all)
    else:
        raise ValueError("Unrecognized loss: {}".format(loss_name))


def coef_vector(loss_cfg):
    """The loss's sweepable hyperparameters as an f32 vector, in
    `coef_names` order — the traced operand the train state carries so one
    compiled program serves every hyperparameter value (module docstring).
    Empty vector for losses with no sweepable coefficients."""
    names = getattr(loss_cfg, "coef_names", ())
    return jnp.asarray([float(getattr(loss_cfg, n)) for n in names],
                       jnp.float32)


def linear_annealing(init, fin, step, annealing_steps):
    """Traced linear ramp init -> fin over `annealing_steps` steps."""
    if annealing_steps == 0:
        return jnp.asarray(fin, jnp.float32)
    delta = fin - init
    return jnp.minimum(init + delta * step / annealing_steps, fin)


@jax.custom_vjp
def _bce_sum(recon, data, mask):
    """Summed binary cross-entropy with torch semantics in BOTH directions:
    forward clamps each log at -100 (as F.binary_cross_entropy does when the
    sigmoid saturates to exact 0/1 in f32); backward is
    (r - d) / max(r * (1 - r), 1e-12) — NOT the gradient of the clamped
    forward, which would silently zero saturated pixels and diverge from the
    reference's training dynamics.

    `mask` broadcasts against the batch (1.0 for the unpadded hot path — a
    literal the compiler folds away; a per-row 0/1 column for padded ragged
    batches under data parallelism)."""
    log_r = jnp.maximum(jnp.log(recon), -100.0)
    log_1mr = jnp.maximum(jnp.log1p(-recon), -100.0)
    return -jnp.sum(mask * (data * log_r + (1 - data) * log_1mr))


def _bce_sum_fwd(recon, data, mask):
    return _bce_sum(recon, data, mask), (recon, data, mask)


def _bce_sum_bwd(res, g):
    recon, data, mask = res
    grad_r = mask * (recon - data) / jnp.maximum(recon * (1 - recon), 1e-12)
    log_r = jnp.maximum(jnp.log(recon), -100.0)
    log_1mr = jnp.maximum(jnp.log1p(-recon), -100.0)
    grad_d = mask * (log_1mr - log_r)
    return (g * grad_r, g * grad_d, jnp.zeros_like(mask))


_bce_sum.defvjp(_bce_sum_fwd, _bce_sum_bwd)


def _row_mask(batch_size, n_valid, ndim):
    """(B, 1, ...) float mask selecting the first `n_valid` rows."""
    shape = (batch_size,) + (1,) * (ndim - 1)
    return (jnp.arange(batch_size) < n_valid).astype(jnp.float32).reshape(
        shape)


def _masked_mean(x, n_valid):
    """Mean of a per-row vector over its first `n_valid` rows (full mean
    when n_valid is None) — the one masked-mean idiom every padded-batch
    loss path shares."""
    if n_valid is None:
        return jnp.mean(x)
    mask = _row_mask(x.shape[0], n_valid, x.ndim).astype(x.dtype)
    return jnp.sum(mask * x) / n_valid


def reconstruction_loss(data, recon_data, distribution="bernoulli",
                        n_valid=None):
    """Per-image negative log likelihood, summed over pixels and averaged over
    the batch (reference losses.py:394-449). data/recon: (N, H, W, C) in [0,1].

    bernoulli -> summed BCE; gaussian -> summed MSE in [0,255] space / 255;
    laplace -> summed L1 * 3 (empirical scale to match bernoulli magnitudes).

    `n_valid` (traced, optional) marks a batch padded for the data-parallel
    mesh: only the first `n_valid` rows are real; the result equals the loss
    of the unpadded batch exactly.
    """
    if n_valid is None:
        denom = recon_data.shape[0]
        mask = 1.0
    else:
        denom = n_valid
        mask = _row_mask(recon_data.shape[0], n_valid, recon_data.ndim)
    if distribution == "bernoulli":
        loss = _bce_sum(recon_data, data, mask)
    elif distribution == "gaussian":
        loss = jnp.sum(mask * (recon_data * 255 - data * 255) ** 2) / 255
    elif distribution == "laplace":
        loss = jnp.sum(mask * jnp.abs(recon_data - data)) * 3
        loss = loss * (loss != 0)  # reference's nan guard (losses.py:439)
    else:
        raise ValueError("Unrecognized distribution: {}".format(distribution))
    return loss / denom


def kl_normal_loss(mean, logvar, n_valid=None):
    """Closed-form KL(q || N(0, I)). Returns (total_kl, per_dim_kl) where
    per_dim_kl is the batch mean per latent dimension (reference
    losses.py:452-480 logs these as kl_loss_i). With `n_valid`, rows past it
    are padding and excluded from the means."""
    term = -1 - logvar + mean ** 2 + jnp.exp(logvar)
    if n_valid is None:
        latent_kl = 0.5 * jnp.mean(term, axis=0)
    else:
        mask = _row_mask(mean.shape[0], n_valid, 2)
        latent_kl = 0.5 * jnp.sum(mask * term, axis=0) / n_valid
    return jnp.sum(latent_kl), latent_kl


def _kl_metrics(mean, logvar, n_valid=None):
    total_kl, latent_kl = kl_normal_loss(mean, logvar, n_valid=n_valid)
    metrics = {"kl_loss": total_kl}
    for i in range(latent_kl.shape[0]):
        metrics["kl_loss_" + str(i)] = latent_kl[i]
    return total_kl, metrics


def metric_key_order(loss_name, latent_dim):
    """Canonical row order of the train log for each loss family, matching
    the reference's storer insertion order so `train_losses.log` files are
    directly comparable line-for-line."""
    kl_keys = ["kl_loss"] + ["kl_loss_" + str(i) for i in range(latent_dim)]
    if loss_name == "btcvae":
        return (["recon_loss", "loss", "mi_loss", "tc_loss", "dw_kl_loss"]
                + kl_keys)
    if loss_name == "factor":
        return ["recon_loss"] + kl_keys + ["loss", "tc_loss", "discrim_loss"]
    return ["recon_loss"] + kl_keys + ["loss"]


@dataclass(frozen=True)
class BetaHLoss:
    """Higgins et al. beta-VAE: rec + anneal * beta * KL (losses.py:117-153).
    With beta=1 this is the plain VAE loss."""
    beta: float = 4.0
    rec_dist: str = "bernoulli"
    steps_anneal: int = 0

    name = "betaH"
    needs_discriminator = False
    coef_names = ("beta",)

    def __call__(self, data, recon_data, latent_dist, is_train, step,
                 latent_sample=None, n_valid=None, coefs=None, **unused):
        beta = self.beta if coefs is None else coefs[0]
        rec_loss = reconstruction_loss(data, recon_data, self.rec_dist,
                                       n_valid=n_valid)
        kl_loss, metrics = _kl_metrics(*latent_dist, n_valid=n_valid)
        anneal_reg = (linear_annealing(0, 1, step, self.steps_anneal)
                      if is_train else 1.0)
        loss = rec_loss + anneal_reg * (beta * kl_loss)
        metrics.update(recon_loss=rec_loss, loss=loss)
        return loss, metrics


@dataclass(frozen=True)
class BetaBLoss:
    """Burgess et al. capacity-annealed beta-VAE:
    rec + gamma * |KL - C(step)| with C ramping C_init -> C_fin
    (losses.py:156-202). Eval uses C = C_fin."""
    C_init: float = 0.0
    C_fin: float = 20.0
    gamma: float = 100.0
    rec_dist: str = "bernoulli"
    steps_anneal: int = 0

    name = "betaB"
    needs_discriminator = False
    coef_names = ("C_init", "C_fin", "gamma")

    def __call__(self, data, recon_data, latent_dist, is_train, step,
                 latent_sample=None, n_valid=None, coefs=None, **unused):
        C_init, C_fin, gamma = ((self.C_init, self.C_fin, self.gamma)
                                if coefs is None else coefs)
        rec_loss = reconstruction_loss(data, recon_data, self.rec_dist,
                                       n_valid=n_valid)
        kl_loss, metrics = _kl_metrics(*latent_dist, n_valid=n_valid)
        C = (linear_annealing(C_init, C_fin, step, self.steps_anneal)
             if is_train else jnp.asarray(C_fin, jnp.float32))
        loss = rec_loss + gamma * jnp.abs(kl_loss - C)
        metrics.update(recon_loss=rec_loss, loss=loss)
        return loss, metrics


@dataclass(frozen=True)
class BtcvaeLoss:
    """beta-TCVAE decomposed ELBO (Chen et al. 2018):
    rec + alpha*MI + beta*TC + anneal*gamma*dwKL (losses.py:316-391), with the
    minibatch stratified sampling estimator by default.

    The O(B^2 D) pairwise log-density matrix is formed with jnp broadcasting;
    under a data-sharded mesh XLA all-gathers the (B, D) latent stats
    (~30 KB) so the estimator stays exact at global batch size.
    """
    n_data: int = 1
    alpha: float = 1.0
    beta: float = 6.0
    gamma: float = 1.0
    is_mss: bool = True
    rec_dist: str = "bernoulli"
    steps_anneal: int = 0

    name = "btcvae"
    needs_discriminator = False
    coef_names = ("alpha", "beta", "gamma")

    def __call__(self, data, recon_data, latent_dist, is_train, step,
                 latent_sample=None, n_valid=None, coefs=None, **unused):
        alpha, beta, gamma = ((self.alpha, self.beta, self.gamma)
                              if coefs is None else coefs)
        rec_loss = reconstruction_loss(data, recon_data, self.rec_dist,
                                       n_valid=n_valid)
        log_pz, log_qz, log_prod_qzi, log_q_zCx = _log_pz_qz_prodzi_qzCx(
            latent_sample, latent_dist, self.n_data, is_mss=self.is_mss,
            n_valid=n_valid)

        mi_loss = _masked_mean(log_q_zCx - log_qz, n_valid)        # I[z;x]
        tc_loss = _masked_mean(log_qz - log_prod_qzi, n_valid)     # TC[z]
        dw_kl_loss = _masked_mean(log_prod_qzi - log_pz, n_valid)  # dwKL
        anneal_reg = (linear_annealing(0, 1, step, self.steps_anneal)
                      if is_train else 1.0)
        loss = rec_loss + (alpha * mi_loss
                           + beta * tc_loss
                           + anneal_reg * gamma * dw_kl_loss)
        _, metrics = _kl_metrics(*latent_dist, n_valid=n_valid)
        metrics.update(recon_loss=rec_loss, loss=loss, mi_loss=mi_loss,
                       tc_loss=tc_loss, dw_kl_loss=dw_kl_loss)
        return loss, metrics


@dataclass(frozen=True)
class FactorKLoss:
    """FactorVAE adversarial total-correlation loss (Kim & Mnih 2018, Alg. 2;
    reference losses.py:205-313). Uses a dedicated train step — see
    train/steps.py — because it updates two parameter sets per iteration on a
    batch split in half. This config carries the discriminator hyperparams;
    the discriminator's params/optimizer live in the train state.
    """
    gamma: float = 10.0
    latent_dim: int = 10
    lr_disc: float = 5e-5
    disc_betas: tuple = (0.5, 0.9)
    rec_dist: str = "bernoulli"
    steps_anneal: int = 0

    name = "factor"
    needs_discriminator = True
    coef_names = ("gamma",)

    def __call__(self, *args, **kwargs):
        raise ValueError("Use the factor train/eval step to also train the "
                         "discriminator")

    def eval_losses(self, data, recon_data, latent_dist, d_z, is_train, step,
                    coefs=None):
        """Evaluation-path loss pieces (no updates): mirrors the storer values
        of call_optimize when model.training is False (losses.py:254-278)."""
        gamma = self.gamma if coefs is None else coefs[0]
        rec_loss = reconstruction_loss(data, recon_data, self.rec_dist)
        kl_loss, metrics = _kl_metrics(*latent_dist)
        tc_loss = jnp.mean(d_z[:, 0] - d_z[:, 1])
        anneal_reg = (linear_annealing(0, 1, step, self.steps_anneal)
                      if is_train else 1.0)
        vae_loss = rec_loss + kl_loss + anneal_reg * gamma * tc_loss
        metrics.update(recon_loss=rec_loss, loss=vae_loss, tc_loss=tc_loss)
        return vae_loss, metrics


def permute_dims(rng, latent_sample, n_valid=None):
    """Independently permute each latent dimension across the batch
    (reference losses.py:483-508). One fused gather instead of a per-dim
    Python loop: draw a (B, D) matrix of random keys, argsort along the batch
    axis to get D independent permutations, then take_along_axis.

    With `n_valid`, only the first n_valid rows participate: their noise
    sorts below the +inf assigned to padded rows, so they permute among
    positions [0, n_valid) and padding sinks to the tail."""
    noise = jax.random.uniform(rng, latent_sample.shape)
    if n_valid is not None:
        valid = jnp.arange(latent_sample.shape[0])[:, None] < n_valid
        noise = jnp.where(valid, noise, jnp.inf)
    pi = jnp.argsort(noise, axis=0)
    return jnp.take_along_axis(latent_sample, pi, axis=0)


def softmax_cross_entropy(logits, labels, n_valid=None):
    """Mean cross entropy with integer labels (torch F.cross_entropy);
    `n_valid` restricts the mean to the first n_valid rows."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=1)[:, 0]
    return _masked_mean(nll, n_valid)


def factor_surrogate(loss_cfg, model, disc, params, disc_params, data, rng,
                     step, is_train=True, n_valid=None, coefs=None):
    """Single differentiable scalar whose gradients wrt (params, disc_params)
    reproduce the reference's dual-backward update exactly.

    Reference semantics (losses.py:243-313): the VAE params receive
    grad(vae_loss) + grad(d_tc_loss) — the latter because d_tc_loss.backward()
    flows through D(z1) into the encoder and optimizer.step() consumes the
    accumulated sum — while the discriminator receives only grad(d_tc_loss)
    (its grads from vae_loss are zeroed first). z_perm is detached.

    Surrogate: vae_loss(params, stop_grad(disc_params)) + d_tc_loss(params,
    disc_params). d/d(params) = both terms; d/d(disc_params) = d_tc only.

    Batch split follows the reference's `data.split(half)` (losses.py:246-251):
    data1 = rows [0, half), data2 = rows [half, 2*half) — on an odd batch the
    trailing row is dropped. With `n_valid` (padded ragged batch under the
    mesh) the same semantics hold at the TRUE size: half = n_valid // 2,
    data2 starts at the traced offset `half`, and every reduction masks to
    its half-count — so the padded step's loss/grads equal the unpadded ones.

    Returns (surrogate, aux) with aux carrying the metric scalars.
    """
    half_p = data.shape[0] // 2
    if n_valid is None:
        half = half_p
        data1 = data[:half_p]
        data2 = data[half_p:2 * half_p]
    else:
        half = n_valid // 2
        data1 = data[:half_p]  # valid rows: [0, half)
        data2 = jax.lax.dynamic_slice_in_dim(data, half, half_p, axis=0)
    rng1, rng2, rng_perm = jax.random.split(rng, 3)
    n_valid_half = None if n_valid is None else half

    recon_batch, latent_dist, z1 = model.apply(params, data1, rng1,
                                               is_train=is_train)
    rec_loss = reconstruction_loss(data1, recon_batch, loss_cfg.rec_dist,
                                   n_valid=n_valid_half)
    kl_loss, kl_metrics = _kl_metrics(*latent_dist, n_valid=n_valid_half)

    disc_params_stop = jax.tree_util.tree_map(jax.lax.stop_gradient,
                                              disc_params)
    d_z_for_vae = disc.apply(disc_params_stop, z1)
    tc_diff = d_z_for_vae[:, 0] - d_z_for_vae[:, 1]
    tc_loss = _masked_mean(tc_diff, n_valid_half)
    anneal_reg = (linear_annealing(0, 1, step, loss_cfg.steps_anneal)
                  if is_train else 1.0)
    gamma = loss_cfg.gamma if coefs is None else coefs[0]
    vae_loss = rec_loss + kl_loss + anneal_reg * gamma * tc_loss

    # Discriminator loss: real z1 vs detached permuted z2.
    z2 = model.sample_latent(params, data2, rng2, is_train=is_train)
    z_perm = jax.lax.stop_gradient(
        permute_dims(rng_perm, z2, n_valid=n_valid_half))
    d_z = disc.apply(disc_params, z1)
    d_z_perm = disc.apply(disc_params, z_perm)
    zeros = jnp.zeros(half_p, dtype=jnp.int32)
    ones = jnp.ones(half_p, dtype=jnp.int32)
    d_tc_loss = 0.5 * (softmax_cross_entropy(d_z, zeros,
                                             n_valid=n_valid_half)
                       + softmax_cross_entropy(d_z_perm, ones,
                                               n_valid=n_valid_half))

    metrics = dict(kl_metrics)
    metrics.update(recon_loss=rec_loss, loss=vae_loss, tc_loss=tc_loss,
                   discrim_loss=d_tc_loss)
    surrogate = vae_loss + d_tc_loss
    return surrogate, metrics


def _log_pz_qz_prodzi_qzCx(latent_sample, latent_dist, n_data, is_mss=True,
                           n_valid=None):
    """btcvae estimator internals (reference losses.py:523-544).

    With `n_valid` (traced), the batch is padded: rows past n_valid are
    phantoms. Their mixture components are removed from the logsumexp via a
    -inf column mask (the MSS weights already carry it; the MWS path gets an
    explicit one), so rows < n_valid hold exactly the values the unpadded
    batch would produce. Padded ROWS still compute (garbage); the caller's
    batch means exclude them."""
    batch_size = latent_sample.shape[0]
    mean, logvar = latent_dist

    log_q_zCx = jnp.sum(log_density_gaussian(latent_sample, mean, logvar),
                        axis=1)
    zeros = jnp.zeros_like(latent_sample)
    log_pz = jnp.sum(log_density_gaussian(latent_sample, zeros, zeros), axis=1)

    mat_log_qz = matrix_log_density_gaussian(latent_sample, mean, logvar)
    if is_mss:
        if n_valid is None:
            log_iw = log_importance_weight_matrix(batch_size, n_data,
                                                  mat_log_qz.dtype)
        else:
            log_iw = log_importance_weight_matrix_masked(
                batch_size, n_valid, n_data, mat_log_qz.dtype)
        mat_log_qz = mat_log_qz + log_iw[:, :, None]
    elif n_valid is not None:
        col_mask = jnp.where(jnp.arange(batch_size) < n_valid, 0.0, -jnp.inf)
        mat_log_qz = mat_log_qz + col_mask[None, :, None]

    log_qz = jax.scipy.special.logsumexp(jnp.sum(mat_log_qz, axis=2), axis=1)
    log_prod_qzi = jnp.sum(jax.scipy.special.logsumexp(mat_log_qz, axis=1),
                           axis=1)
    return log_pz, log_qz, log_prod_qzi, log_q_zCx
