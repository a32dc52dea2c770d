"""MIG / AAM metric tests: streaming logsumexp correctness + end-to-end
behavior on a synthetic factor lattice."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from disvae_tpu.data.datasets import ArrayDataset, DataLoader
from disvae_tpu.models.vae import init_specific_model
from disvae_tpu.ops.losses import BetaHLoss
from disvae_tpu.ops.math import log_density_gaussian
from disvae_tpu.train.evaluate import Evaluator, _streaming_log_qz


def test_streaming_log_qz_matches_naive():
    rng = np.random.RandomState(0)
    M, D, S = 300, 4, 17  # deliberately not multiples of the chunk size
    mu = rng.randn(M, D).astype(np.float32)
    logvar = (rng.randn(M, D) * 0.3).astype(np.float32)
    values = rng.randn(D, S).astype(np.float32)

    got = np.asarray(_streaming_log_qz(jnp.asarray(values), jnp.asarray(mu),
                                       jnp.asarray(logvar), comp_chunk=64))
    # naive: logsumexp over all M components
    ld = log_density_gaussian(values[None, :, :], mu[:, :, None],
                              logvar[:, :, None])  # (M, D, S)
    expect = np.asarray(jax.scipy.special.logsumexp(jnp.asarray(ld), axis=0))
    assert np.allclose(got, expect, atol=1e-4)


def _make_evaluator(latent_dim=4, save_dir="."):
    model, params = init_specific_model("Burgess", (1, 32, 32), latent_dim,
                                        key=jax.random.PRNGKey(0))
    return Evaluator(model, params, BetaHLoss(beta=1), save_dir=save_dir,
                     is_progress_bar=False)


def test_entropy_estimator_gaussian_sanity(tmp_path):
    """If q(z|x) = N(0,1) for every x, then q(z) = N(0,1) and
    H(z_j) ~= 0.5*log(2*pi*e) ~= 1.4189."""
    ev = _make_evaluator(save_dir=str(tmp_path))
    M, D = 2000, 3
    rng = np.random.RandomState(0)
    samples = jnp.asarray(rng.randn(M, D).astype(np.float32))
    mu = jnp.zeros((M, D), jnp.float32)
    logvar = jnp.zeros((M, D), jnp.float32)
    H = ev._estimate_latent_entropies(samples, (mu, logvar), n_samples=2000)
    expect = 0.5 * np.log(2 * np.pi * np.e)
    assert np.allclose(H, expect, atol=0.05)


def test_mig_pipeline_on_synthetic_lattice(tmp_path):
    """A code where z_0 encodes factor A and z_1 encodes factor B perfectly
    must give MIG near 1; a pure-noise code must give MIG near 0.

    The dataset is a full (6, 8) factor lattice; the 'encoder' outputs are
    injected by monkeypatching _compute_q_zCx to isolate the metric math.
    """
    lat_sizes = [6, 8]
    N = 48
    imgs = np.zeros((N, 32, 32, 1), np.uint8)
    ds = ArrayDataset(imgs, lat_sizes=lat_sizes, lat_names=("A", "B"))
    loader = DataLoader(ds, batch_size=16, shuffle=False)

    a_vals, b_vals = np.meshgrid(np.arange(6), np.arange(8), indexing="ij")
    a = a_vals.ravel().astype(np.float32)
    b = b_vals.ravel().astype(np.float32)

    def run_with_code(mu):
        ev = _make_evaluator(latent_dim=mu.shape[1], save_dir=str(tmp_path))
        logvar = np.full_like(mu, np.log(0.01 ** 2))
        ev._compute_q_zCx = lambda dl: (jnp.asarray(mu),
                                        (jnp.asarray(mu),
                                         jnp.asarray(logvar)))
        return ev.compute_metrics(loader)

    # perfectly disentangled: z0 = A, z1 = B, z2/z3 dead
    mu_good = np.stack([a, b, np.zeros(N, np.float32),
                        np.zeros(N, np.float32)], axis=1)
    np.random.seed(0)
    good = run_with_code(mu_good)
    # dead code: all dims constant
    mu_dead = np.zeros((N, 4), np.float32)
    np.random.seed(0)
    dead = run_with_code(mu_dead)

    assert good["MIG"] > 0.5
    assert abs(dead["MIG"]) < 0.05
    assert good["MIG"] > dead["MIG"]
    assert 0 <= good["AAM"] <= 1.0001


def test_metrics_require_factor_metadata(tmp_path):
    ev = _make_evaluator(save_dir=str(tmp_path))
    ds = ArrayDataset(np.zeros((8, 32, 32, 1), np.uint8))
    loader = DataLoader(ds, batch_size=4)
    with pytest.raises(ValueError):
        ev.compute_metrics(loader)


def test_metric_files_written(tmp_path):
    """compute_metrics persists metrics.log + metric_helpers.pth."""
    import os
    lat_sizes = [2, 3]
    N = 6
    ds = ArrayDataset(np.random.RandomState(0).randint(
        0, 255, (N, 32, 32, 1), np.uint8), lat_sizes=lat_sizes,
        lat_names=("a", "b"))
    loader = DataLoader(ds, batch_size=3, shuffle=False)
    ev = _make_evaluator(save_dir=str(tmp_path))
    metrics, _ = ev(loader, is_metrics=True, is_losses=False)
    assert set(metrics) == {"MIG", "AAM"}
    assert os.path.exists(os.path.join(str(tmp_path), "metrics.log"))
    assert os.path.exists(os.path.join(str(tmp_path), "metric_helpers.pth"))


def test_pallas_log_qz_matches_streaming():
    """The Pallas online-logsumexp kernel (interpret mode on CPU) and the
    MXU polynomial variant agree with the XLA streaming scan."""
    from disvae_tpu.ops.pallas_kernels import log_qz, log_qz_mxu
    rng = np.random.RandomState(0)
    M, D, S = 700, 3, 300  # deliberately not multiples of the block sizes
    mu = jnp.asarray(rng.randn(M, D).astype(np.float32))
    lv = jnp.asarray((rng.randn(M, D) * 0.3).astype(np.float32))
    v = jnp.asarray(rng.randn(D, S).astype(np.float32))
    ref = np.asarray(_streaming_log_qz(v, mu, lv))
    got = np.asarray(log_qz(v, mu, lv, interpret=True))
    np.testing.assert_allclose(got, ref, atol=1e-4)
    got_mxu = np.asarray(log_qz_mxu(v, mu, lv, chunk=256, prec="highest"))
    np.testing.assert_allclose(got_mxu, ref, atol=1e-3)


def test_batched_entropy_matches_unbatched(tmp_path, monkeypatch):
    """The vmapped per-factor conditional-entropy estimator must agree with
    independent per-slice estimates. The estimator inherits the reference's
    reshape-scramble of the (S, D) sample block (evaluate.py:270), which
    makes results depend on the drawn permutation — pin it to arange so the
    two code paths see identical inputs."""
    monkeypatch.setattr(np.random, "permutation", lambda n: np.arange(n))
    ev = _make_evaluator(save_dir=str(tmp_path))
    rng = np.random.RandomState(0)
    L, M, D = 3, 40, 4
    samples = jnp.asarray(rng.randn(L, M, D).astype(np.float32))
    mu = samples * 0.9
    lv = jnp.asarray((rng.randn(L, M, D) * 0.1).astype(np.float32))
    batched = ev._estimate_latent_entropies_batched(samples, (mu, lv),
                                                    n_samples=M)
    for i in range(L):
        single = ev._estimate_latent_entropies(samples[i], (mu[i], lv[i]),
                                               n_samples=M)
        np.testing.assert_allclose(batched[i], np.asarray(single), atol=1e-4)
