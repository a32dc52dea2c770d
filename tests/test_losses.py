"""Behavioral tests for the five loss families."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from disvae_tpu.models.discriminator import Discriminator
from disvae_tpu.models.vae import init_specific_model
from disvae_tpu.ops import losses as L


def _fake_batch(batch=8, img=(1, 32, 32), seed=0):
    rng = np.random.RandomState(seed)
    c, h, w = img
    data = rng.rand(batch, h, w, c).astype(np.float32)
    recon = np.clip(rng.rand(batch, h, w, c).astype(np.float32), 0.01, 0.99)
    mu = rng.randn(batch, 10).astype(np.float32)
    logvar = (rng.randn(batch, 10) * 0.1).astype(np.float32)
    z = mu + np.exp(0.5 * logvar) * rng.randn(batch, 10).astype(np.float32)
    return (jnp.asarray(data), jnp.asarray(recon),
            (jnp.asarray(mu), jnp.asarray(logvar)), jnp.asarray(z))


def test_get_loss_f_registry():
    kwargs = dict(rec_dist="bernoulli", reg_anneal=100, betaH_B=4,
                  betaB_initC=0, betaB_finC=25, betaB_G=100, factor_G=6,
                  lr_disc=5e-5, latent_dim=10, btcvae_A=1, btcvae_B=6,
                  btcvae_G=1, n_data=1000, device=None)
    assert isinstance(L.get_loss_f("VAE", **kwargs), L.BetaHLoss)
    assert L.get_loss_f("VAE", **kwargs).beta == 1
    assert L.get_loss_f("betaH", **kwargs).beta == 4
    assert isinstance(L.get_loss_f("betaB", **kwargs), L.BetaBLoss)
    assert isinstance(L.get_loss_f("factor", **kwargs), L.FactorKLoss)
    assert isinstance(L.get_loss_f("btcvae", **kwargs), L.BtcvaeLoss)
    with pytest.raises(ValueError):
        L.get_loss_f("nope", **kwargs)


def test_linear_annealing():
    assert float(L.linear_annealing(0, 1, 50, 100)) == pytest.approx(0.5)
    assert float(L.linear_annealing(0, 1, 200, 100)) == 1.0
    assert float(L.linear_annealing(0, 1, 123, 0)) == 1.0  # disabled => fin


def test_betaH_vs_vae():
    data, recon, dist, z = _fake_batch()
    vae = L.BetaHLoss(beta=1, steps_anneal=0)
    betah = L.BetaHLoss(beta=4, steps_anneal=0)
    l1, m1 = vae(data, recon, dist, True, 10, latent_sample=z)
    l4, m4 = betah(data, recon, dist, True, 10, latent_sample=z)
    kl = float(m1["kl_loss"])
    assert float(l4) == pytest.approx(float(l1) + 3 * kl, rel=1e-5)
    assert float(m1["loss"]) == pytest.approx(float(l1))


def test_betaH_annealing_ramps():
    data, recon, dist, z = _fake_batch()
    loss_cfg = L.BetaHLoss(beta=4, steps_anneal=100)
    l_early, _ = loss_cfg(data, recon, dist, True, 1, latent_sample=z)
    l_late, _ = loss_cfg(data, recon, dist, True, 100, latent_sample=z)
    l_eval, _ = loss_cfg(data, recon, dist, False, 1, latent_sample=z)
    assert float(l_early) < float(l_late)
    assert float(l_eval) == pytest.approx(float(l_late), rel=1e-6)


def test_betaB_capacity():
    data, recon, dist, z = _fake_batch()
    cfg = L.BetaBLoss(C_init=0, C_fin=25, gamma=100, steps_anneal=1000)
    _, m = cfg(data, recon, dist, True, 500, latent_sample=z)
    kl = float(m["kl_loss"])
    # at step 500, C = 12.5
    expect = float(m["recon_loss"]) + 100 * abs(kl - 12.5)
    assert float(m["loss"]) == pytest.approx(expect, rel=1e-5)
    # eval uses C_fin
    _, m_eval = cfg(data, recon, dist, False, 500, latent_sample=z)
    expect_eval = float(m_eval["recon_loss"]) + 100 * abs(kl - 25)
    assert float(m_eval["loss"]) == pytest.approx(expect_eval, rel=1e-5)


def test_btcvae_terms_sum():
    data, recon, dist, z = _fake_batch()
    cfg = L.BtcvaeLoss(n_data=500, alpha=1, beta=6, gamma=1, steps_anneal=0)
    loss, m = cfg(data, recon, dist, True, 10, latent_sample=z)
    expect = (float(m["recon_loss"]) + float(m["mi_loss"])
              + 6 * float(m["tc_loss"]) + float(m["dw_kl_loss"]))
    assert float(loss) == pytest.approx(expect, rel=1e-4)


def test_btcvae_mws_vs_mss_differ():
    data, recon, dist, z = _fake_batch()
    mss = L.BtcvaeLoss(n_data=500, is_mss=True)
    mws = L.BtcvaeLoss(n_data=500, is_mss=False)
    l1, _ = mss(data, recon, dist, True, 1, latent_sample=z)
    l2, _ = mws(data, recon, dist, True, 1, latent_sample=z)
    assert float(l1) != float(l2)


def test_permute_dims_properties():
    rng = jax.random.PRNGKey(0)
    z = jnp.asarray(np.random.RandomState(0).randn(64, 10).astype(np.float32))
    zp = L.permute_dims(rng, z)
    # each column is a permutation of the original column
    for d in range(10):
        assert np.allclose(np.sort(np.asarray(z[:, d])),
                           np.sort(np.asarray(zp[:, d])))
    # but rows are scrambled (joint broken)
    assert not np.allclose(np.asarray(z), np.asarray(zp))
    # different dims use different permutations
    pi0 = np.argsort(np.asarray(z[:, 0])), np.argsort(np.asarray(zp[:, 0]))
    pi1 = np.argsort(np.asarray(z[:, 1])), np.argsort(np.asarray(zp[:, 1]))
    assert not np.array_equal(pi0[1], pi1[1])


def test_factor_surrogate_grad_flow(rng_key):
    """The surrogate must give: disc grads == grads of d_tc only; vae grads
    == grads of (vae_loss + d_tc_loss through D(z1))."""
    model, params = init_specific_model("Burgess", (1, 32, 32), 4,
                                        key=rng_key)
    disc = Discriminator(latent_dim=4)
    disc_params = disc.init(jax.random.PRNGKey(1))
    cfg = L.FactorKLoss(gamma=6, latent_dim=4, steps_anneal=0)
    data = jax.random.uniform(jax.random.PRNGKey(2), (8, 32, 32, 1))
    rng = jax.random.PRNGKey(3)

    grad_fn = jax.grad(
        lambda p, dp: L.factor_surrogate(cfg, model, disc, p, dp, data, rng,
                                         1, is_train=True)[0],
        argnums=(0, 1))
    g_vae, g_disc = grad_fn(params, disc_params)

    # disc grads must equal grads of the pure d_tc loss
    def d_tc_only(dp):
        half = 4
        rng1, rng2, rng_perm = jax.random.split(rng, 3)
        z1 = model.sample_latent(params, data[:half], rng1)
        z2 = model.sample_latent(params, data[half:], rng2)
        z_perm = jax.lax.stop_gradient(L.permute_dims(rng_perm, z2))
        d_z = disc.apply(dp, z1)
        d_zp = disc.apply(dp, z_perm)
        zeros = jnp.zeros(half, jnp.int32)
        ones = jnp.ones(half, jnp.int32)
        return 0.5 * (L.softmax_cross_entropy(d_z, zeros)
                      + L.softmax_cross_entropy(d_zp, ones))

    g_disc_expect = jax.grad(d_tc_only)(disc_params)
    flat1 = jax.tree_util.tree_leaves(g_disc)
    flat2 = jax.tree_util.tree_leaves(g_disc_expect)
    for a, b in zip(flat1, flat2):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    # vae grads are nonzero and include the d_tc path: removing d_tc from the
    # surrogate changes encoder grads
    def vae_only(p):
        half = 4
        rng1, _, _ = jax.random.split(rng, 3)
        recon, latent_dist, z1 = model.apply(p, data[:half], rng1)
        rec = L.reconstruction_loss(data[:half], recon, cfg.rec_dist)
        kl, _ = L.kl_normal_loss(*latent_dist)
        d_z = disc.apply(disc_params, z1)
        tc = jnp.mean(d_z[:, 0] - d_z[:, 1])
        return rec + kl + cfg.gamma * tc

    g_vae_only = jax.grad(vae_only)(params)
    enc_g = np.asarray(g_vae["encoder"]["lin1"]["w"])
    enc_g_only = np.asarray(g_vae_only["encoder"]["lin1"]["w"])
    assert not np.allclose(enc_g, enc_g_only)
    assert np.abs(enc_g).max() > 0


def test_metric_key_order():
    assert L.metric_key_order("betaH", 2) == [
        "recon_loss", "kl_loss", "kl_loss_0", "kl_loss_1", "loss"]
    assert L.metric_key_order("btcvae", 1) == [
        "recon_loss", "loss", "mi_loss", "tc_loss", "dw_kl_loss",
        "kl_loss", "kl_loss_0"]
    assert L.metric_key_order("factor", 1)[-2:] == ["tc_loss",
                                                    "discrim_loss"]
