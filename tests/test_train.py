"""End-to-end training tests on synthetic data."""

import os

import jax
import numpy as np
import pytest

from disvae_tpu.data.datasets import DataLoader
from disvae_tpu.models.vae import init_specific_model
from disvae_tpu.ops import losses as L
from disvae_tpu.train.trainer import Trainer
from disvae_tpu.train.evaluate import Evaluator


def _train(tmp_path, dataset, loss_cfg, epochs=2, batch_size=16, lr=1e-3,
           latent_dim=10):
    loader = DataLoader(dataset, batch_size=batch_size, shuffle=True, seed=0)
    img_size = dataset.img_size
    model, params = init_specific_model("Burgess", img_size, latent_dim,
                                        key=jax.random.PRNGKey(0))
    trainer = Trainer(model, params, loss_cfg, lr=lr,
                      rng=jax.random.PRNGKey(1),
                      save_dir=str(tmp_path), is_progress_bar=False)
    trainer(loader, epochs=epochs, checkpoint_every=1)
    return trainer, loader


@pytest.mark.parametrize("loss_cfg", [
    L.BetaHLoss(beta=1, steps_anneal=0),
    L.BetaBLoss(C_init=0, C_fin=5, gamma=10, steps_anneal=10),
    L.BtcvaeLoss(n_data=96, alpha=1, beta=6, gamma=1, steps_anneal=0),
], ids=["VAE", "betaB", "btcvae"])
def test_losses_train_and_log(tmp_path, tiny_dataset, loss_cfg):
    trainer, _ = _train(tmp_path, tiny_dataset, loss_cfg)
    log = os.path.join(str(tmp_path), "train_losses.log")
    assert os.path.exists(log)
    lines = open(log).read().strip().split("\n")
    assert lines[0] == "Epoch,Loss,Value"
    # 96/16 = 6 steps/epoch; step 1 of epoch 0 is recorded (1 % 50 == 1)
    epoch0 = [l for l in lines[1:] if l.startswith("0,")]
    keys = [l.split(",")[1] for l in epoch0]
    assert keys == L.metric_key_order(loss_cfg.name, 10)
    # checkpoints for epochs 0 and 1
    assert os.path.exists(os.path.join(str(tmp_path), "model-0.npz"))
    assert os.path.exists(os.path.join(str(tmp_path), "model-1.npz"))


def test_factor_trains(tmp_path, tiny_dataset):
    cfg = L.FactorKLoss(gamma=6, latent_dim=10, lr_disc=5e-5, steps_anneal=0)
    trainer, _ = _train(tmp_path, tiny_dataset, cfg)
    assert trainer.state.disc_params is not None
    log = open(os.path.join(str(tmp_path), "train_losses.log")).read()
    assert "discrim_loss" in log and "tc_loss" in log


def test_loss_decreases(tmp_path, tiny_dataset):
    """5 epochs of plain VAE on 96 images must reduce reconstruction loss."""
    cfg = L.BetaHLoss(beta=1, steps_anneal=0)
    loader = DataLoader(tiny_dataset, batch_size=16, shuffle=True, seed=0)
    model, params = init_specific_model("Burgess", tiny_dataset.img_size, 10,
                                        key=jax.random.PRNGKey(0))
    trainer = Trainer(model, params, cfg, lr=1e-3,
                      rng=jax.random.PRNGKey(1),
                      save_dir=str(tmp_path), is_progress_bar=False)
    first, _ = trainer._train_epoch(loader, 0)
    for e in range(4):
        last, _ = trainer._train_epoch(loader, e + 1)
    assert last < first


def test_step_counter_advances(tmp_path, tiny_dataset):
    cfg = L.BetaHLoss(beta=1, steps_anneal=0)
    trainer, loader = _train(tmp_path, tiny_dataset, cfg, epochs=2)
    assert int(trainer.state.step) == 2 * len(loader)


def test_evaluator_losses(tmp_path, tiny_dataset):
    cfg = L.BetaHLoss(beta=1, steps_anneal=0)
    trainer, _ = _train(tmp_path, tiny_dataset, cfg, epochs=1)
    loader = DataLoader(tiny_dataset, batch_size=32, shuffle=False)
    ev = Evaluator(trainer.model, trainer.params, cfg,
                   save_dir=str(tmp_path), is_progress_bar=False)
    _, losses = ev(loader, is_metrics=False, is_losses=True)
    assert os.path.exists(os.path.join(str(tmp_path), "test_losses.log"))
    # first-batch quirk: stored values are first-batch means / n_batches
    assert set(losses) == set(L.metric_key_order("betaH", 10))
    n_batches = len(loader)
    batch, _ = next(iter(loader))
    import jax.numpy as jnp
    metrics = ev._eval_step(ev.params, None, jnp.asarray(batch))
    assert losses["loss"] == pytest.approx(float(metrics["loss"]) / n_batches,
                                           rel=1e-5)


def test_factor_evaluator(tmp_path, tiny_dataset):
    cfg = L.FactorKLoss(gamma=6, latent_dim=10, lr_disc=5e-5, steps_anneal=0)
    model, params = init_specific_model("Burgess", tiny_dataset.img_size, 10,
                                        key=jax.random.PRNGKey(0))
    loader = DataLoader(tiny_dataset, batch_size=32, shuffle=False)
    ev = Evaluator(model, params, cfg, rng=jax.random.PRNGKey(5),
                   save_dir=str(tmp_path), is_progress_bar=False)
    _, losses = ev(loader, is_metrics=False, is_losses=True)
    # eval path: no discriminator loss recorded (reference returns early)
    assert "discrim_loss" not in losses and "tc_loss" in losses


@pytest.mark.parametrize("loss_cfg,param_atol", [
    (L.BetaHLoss(beta=4, steps_anneal=5), 2e-4),
    # the adversarial objective amplifies compile-level fp reassociation
    (L.FactorKLoss(gamma=6, latent_dim=10, lr_disc=5e-5, steps_anneal=0),
     2e-3),
], ids=["betaH", "factor"])
def test_scan_superstep_matches_single_step(tmp_path, tiny_dataset, loss_cfg,
                                            param_atol):
    """A K-step lax.scan super-step must match K individual dispatches
    (same RNG threading, same step counter). Compared after ONE superstep —
    longer horizons amplify fp-reassociation noise chaotically (especially
    the adversarial factor loss)."""
    from disvae_tpu.data.datasets import ArrayDataset
    small = ArrayDataset(tiny_dataset.imgs[:48])  # 3 batches of 16

    def run(k):
        loader = DataLoader(small, batch_size=16, shuffle=True, seed=0)
        model, params = init_specific_model("Burgess", small.img_size,
                                            10, key=jax.random.PRNGKey(0))
        trainer = Trainer(model, params, loss_cfg, lr=1e-3,
                          rng=jax.random.PRNGKey(1),
                          save_dir=str(tmp_path), is_progress_bar=False,
                          steps_per_dispatch=k)
        loss, storer = trainer._train_epoch(loader, 0)
        return loss, storer, trainer.state

    loss1, storer1, state1 = run(1)
    loss3, storer3, state3 = run(3)  # 3 batches -> exactly 1 superstep
    assert loss1 == pytest.approx(loss3, rel=1e-5)
    assert set(storer1) == set(storer3)
    for k in storer1:
        assert storer1[k] == pytest.approx(storer3[k], rel=1e-4, abs=1e-6)
    assert int(state1.step) == int(state3.step) == 3
    p1 = jax.tree_util.tree_leaves(state1.params)
    p3 = jax.tree_util.tree_leaves(state3.params)
    for a, b in zip(p1, p3):
        # the scanned and unrolled programs are different XLA compilations;
        # reduction reassociation alone leaves ~5e-5 param drift per step
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=param_atol)


def test_checkpoint_resume_bitexact(tmp_path, tiny_dataset):
    """Training 4 epochs straight == training 2, resuming, training 2 more."""
    cfg = L.BetaHLoss(beta=1, steps_anneal=0)

    def fresh(save_dir, resume=False):
        model, params = init_specific_model("Burgess", tiny_dataset.img_size,
                                            10, key=jax.random.PRNGKey(0))
        return Trainer(model, params, cfg, lr=1e-3,
                       rng=jax.random.PRNGKey(1), save_dir=str(save_dir),
                       is_progress_bar=False, resume=resume)

    d1 = tmp_path / "straight"; d1.mkdir()
    d2 = tmp_path / "resumed"; d2.mkdir()
    loader = lambda: DataLoader(tiny_dataset, batch_size=16, shuffle=True,
                                seed=0)

    t_straight = fresh(d1)
    t_straight(loader(), epochs=4, checkpoint_every=1)

    t_a = fresh(d2)
    t_a(loader(), epochs=2, checkpoint_every=1)
    t_b = fresh(d2, resume=True)
    assert t_b._start_epoch == 2
    # the resumed loader must replay epochs 2,3's shuffles: advance it
    lb = loader()
    lb._epoch = 2
    t_b(lb, epochs=4, checkpoint_every=1)

    pa = jax.tree_util.tree_leaves(t_straight.state.params)
    pb = jax.tree_util.tree_leaves(t_b.state.params)
    for a, b in zip(pa, pb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    assert int(t_straight.state.step) == int(t_b.state.step)
    # resume appended rather than truncating: epoch-0 rows exist exactly once
    # (later epochs log nothing — no step hits the record-every-50 gate)
    log = open(d2 / "train_losses.log").read()
    assert log.count("\n0,loss,") == 1


def test_resume_honors_current_hyperparameters(tmp_path, tiny_dataset):
    """--resume with different CLI hyperparameters must train at the NEW
    values (what specs.json records), not the checkpoint's: state.coefs is
    a pure function of the current loss config, re-derived on load. (r3
    review finding: the traced-coefs vector made the checkpoint silently
    win over the CLI.)"""
    def fresh(beta, resume=False):
        cfg = L.BetaHLoss(beta=beta, steps_anneal=0)
        model, params = init_specific_model("Burgess", tiny_dataset.img_size,
                                            10, key=jax.random.PRNGKey(0))
        return Trainer(model, params, cfg, lr=1e-3,
                       rng=jax.random.PRNGKey(1), save_dir=str(tmp_path),
                       is_progress_bar=False, resume=resume)

    loader = DataLoader(tiny_dataset, batch_size=16, shuffle=True, seed=0)
    t0 = fresh(beta=4)
    t0(loader, epochs=1, checkpoint_every=1)

    t1 = fresh(beta=8, resume=True)
    assert t1._start_epoch == 1
    np.testing.assert_array_equal(
        np.asarray(t1.state.coefs),
        np.asarray(L.coef_vector(L.BetaHLoss(beta=8, steps_anneal=0))))
    # and NOT the checkpointed beta=4 vector
    assert not np.array_equal(
        np.asarray(t1.state.coefs),
        np.asarray(L.coef_vector(L.BetaHLoss(beta=4, steps_anneal=0))))


def test_sharded_trainer_and_evaluator_on_mesh(tmp_path, tiny_dataset):
    """Data-parallel Trainer + Evaluator over the 8-virtual-device mesh
    produce finite losses and the standard artifacts."""
    from disvae_tpu.parallel.mesh import create_mesh
    mesh = create_mesh()
    assert mesh.devices.size == 8
    cfg = L.BtcvaeLoss(n_data=96, alpha=1, beta=6, gamma=1, steps_anneal=0)
    loader = DataLoader(tiny_dataset, batch_size=32, shuffle=True, seed=0,
                        drop_last=True)  # batch must divide the mesh axis
    model, params = init_specific_model("Burgess", tiny_dataset.img_size, 10,
                                        key=jax.random.PRNGKey(0))
    trainer = Trainer(model, params, cfg, lr=1e-3,
                      rng=jax.random.PRNGKey(1), save_dir=str(tmp_path),
                      is_progress_bar=False, mesh=mesh)
    loss, _ = trainer._train_epoch(loader, 0)
    assert np.isfinite(loss)

    ev = Evaluator(trainer.model, trainer.params, cfg,
                   save_dir=str(tmp_path), is_progress_bar=False, mesh=mesh)
    _, losses = ev(loader, is_metrics=False, is_losses=True)
    assert np.isfinite(losses["loss"])


def test_local_batch_slice_single_host():
    from disvae_tpu.parallel.distributed import local_batch_slice
    assert local_batch_slice(256) == (0, 256)


def test_tensor_parallel_factor_step_on_mesh(tmp_path, tiny_dataset):
    """FactorVAE step with the discriminator's hidden layers sharded over a
    real 'model' axis (2-way TP x 4-way DP on the 8-device mesh) must
    produce the same update as the replicated path."""
    import jax.numpy as jnp
    from functools import partial
    from disvae_tpu.models.discriminator import Discriminator
    from disvae_tpu.parallel.mesh import (create_mesh, make_tp_train_step,
                                          shard_batch)
    from disvae_tpu.train.state import create_train_state
    from disvae_tpu.train.steps import (_factor_train_step,
                                        make_disc_optimizer, make_optimizer,
                                        make_train_step)

    cfg = L.FactorKLoss(gamma=6, latent_dim=10, lr_disc=5e-5, steps_anneal=0)
    disc = Discriminator(latent_dim=10)
    opt = make_optimizer(1e-3)
    d_opt = make_disc_optimizer(cfg)
    batch = np.random.RandomState(0).rand(32, 32, 32, 1).astype(np.float32)

    def make_state():
        model, params = init_specific_model("Burgess", (1, 32, 32), 10,
                                            key=jax.random.PRNGKey(0))
        return model, create_train_state(model, params, opt,
                                         jax.random.PRNGKey(1), disc=disc,
                                         disc_optimizer=d_opt,
                                         disc_rng=jax.random.PRNGKey(2))

    # replicated DP over all 8 devices
    mesh_dp = create_mesh()
    model, state = make_state()
    step_dp = make_train_step(model, cfg, opt, disc=disc,
                              disc_optimizer=d_opt, mesh=mesh_dp,
                              donate=False)
    _, m_dp = step_dp(state, shard_batch(batch, mesh_dp))

    # 4-way DP x 2-way TP
    mesh_tp = create_mesh(model_parallel=2)
    assert mesh_tp.shape["model"] == 2
    model, state_tp = make_state()
    raw = partial(_factor_train_step, model, cfg, opt, disc, d_opt)
    step_tp = make_tp_train_step(raw, mesh_tp, state_tp, donate=False)
    new_state, m_tp = step_tp(state_tp, shard_batch(batch, mesh_tp))

    assert m_dp["loss"] == pytest.approx(float(m_tp["loss"]), rel=1e-4)
    assert m_dp["discrim_loss"] == pytest.approx(float(m_tp["discrim_loss"]),
                                                 rel=1e-4)
    # disc params actually carry the TP sharding
    w1 = new_state.disc_params["lin2"]["w"]
    specs = {s.spec for s in [w1.sharding]}
    assert any("model" in str(s) for s in specs), specs


def test_sharded_step_matches_single_device(tmp_path, tiny_dataset):
    """One btcvae step on the 8-device data-parallel mesh must produce the
    SAME loss/metrics and the same updated params as the single-device step
    (the (B, B, D) pairwise estimator and its MSS weights see the global
    batch exactly, via XLA's all-gather)."""
    from disvae_tpu.parallel.mesh import create_mesh, shard_batch
    from disvae_tpu.train.state import create_train_state
    from disvae_tpu.train.steps import make_optimizer, make_train_step

    cfg = L.BtcvaeLoss(n_data=96, alpha=1, beta=6, gamma=1, steps_anneal=0)
    opt = make_optimizer(1e-3)
    batch = np.random.RandomState(0).rand(32, 32, 32, 1).astype(np.float32)

    def make(mesh):
        model, params = init_specific_model("Burgess", (1, 32, 32), 10,
                                            key=jax.random.PRNGKey(0))
        state = create_train_state(model, params, opt, jax.random.PRNGKey(1))
        step = make_train_step(model, cfg, opt, mesh=mesh, donate=False)
        return state, step

    state1, step1 = make(None)
    s1, m1 = step1(state1, jax.numpy.asarray(batch))

    mesh = create_mesh()
    state8, step8 = make(mesh)
    s8, m8 = step8(state8, shard_batch(batch, mesh))

    assert float(m1["loss"]) == pytest.approx(float(m8["loss"]), rel=1e-5)
    assert float(m1["tc_loss"]) == pytest.approx(float(m8["tc_loss"]),
                                                 abs=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-6)


def test_trainer_with_bitpacked_binary_dataset(tmp_path):
    """Training on a binary dataset rides the bitpacked wire format through
    the superbatch path and must produce the same losses as the float feed."""
    from disvae_tpu.data.datasets import ArrayDataset, DataLoader

    class BinaryDS(ArrayDataset):
        is_binary = True
        _scale = 1.0

    imgs = (np.random.RandomState(0).rand(96, 32, 32, 1) > 0.5).astype(
        np.uint8)
    cfg = L.BetaHLoss(beta=1, steps_anneal=0)

    def run(raw_supported):
        ds = BinaryDS(imgs) if raw_supported else ArrayDataset(imgs * 255)
        loader = DataLoader(ds, batch_size=16, shuffle=True, seed=0)
        model, params = init_specific_model("Burgess", (1, 32, 32), 10,
                                            key=jax.random.PRNGKey(0))
        trainer = Trainer(model, params, cfg, lr=1e-3,
                          rng=jax.random.PRNGKey(1), save_dir=str(tmp_path),
                          is_progress_bar=False, steps_per_dispatch=3)
        return trainer._train_epoch(loader, 0)[0]

    loss_bits = run(True)
    loss_float = run(False)  # {0,255} bytes -> /255 -> same {0,1} images
    assert loss_bits == pytest.approx(loss_float, rel=1e-5)


@pytest.mark.parametrize("loss_cfg", [
    L.BetaHLoss(beta=1, steps_anneal=0),
    L.BetaBLoss(C_init=0, C_fin=5, gamma=30, steps_anneal=10),
    L.BtcvaeLoss(n_data=1000, alpha=1, beta=6, gamma=1, steps_anneal=10),
    L.BtcvaeLoss(n_data=1000, alpha=1, beta=6, gamma=1, steps_anneal=0,
                 is_mss=False),
    L.FactorKLoss(gamma=6, latent_dim=10, lr_disc=5e-5, steps_anneal=0),
], ids=["VAE", "betaB", "btcvae-mss", "btcvae-mws", "factor"])
def test_padded_step_matches_unpadded(loss_cfg):
    """A ragged batch (71 rows, indivisible by the 8-way data axis) padded
    to 72 and run through the mask-aware sharded step must produce the SAME
    loss/metrics as the unpadded single-device step: every batch-size
    dependent quantity (reconstruction/KL means, MSS weights built for the
    TRUE size, FactorVAE's half split) is evaluated at n_valid=71.
    Gates VERDICT item 2 (reference keeps partial batches and B enters
    /root/reference/disvae/utils/math.py:54-73)."""
    import jax.numpy as jnp
    from disvae_tpu.models.discriminator import Discriminator
    from disvae_tpu.parallel.mesh import (create_mesh, pad_to_multiple,
                                          shard_batch)
    from disvae_tpu.train.state import create_train_state
    from disvae_tpu.train.steps import (make_disc_optimizer, make_optimizer,
                                        make_padded_train_step,
                                        make_train_step)

    mesh = create_mesh()
    model, params = init_specific_model("Burgess", (1, 32, 32), 10,
                                        key=jax.random.PRNGKey(0))
    opt = make_optimizer(5e-4)
    disc = disc_opt = None
    if loss_cfg.needs_discriminator:
        disc = Discriminator(latent_dim=10)
        disc_opt = make_disc_optimizer(loss_cfg)

    def make_state():
        return create_train_state(model, params, opt, jax.random.PRNGKey(1),
                                  disc=disc, disc_optimizer=disc_opt,
                                  disc_rng=jax.random.PRNGKey(2))

    batch = np.random.RandomState(0).rand(71, 32, 32, 1).astype(np.float32)

    st0 = make_state()
    step0 = make_train_step(model, loss_cfg, opt, disc=disc,
                            disc_optimizer=disc_opt, donate=False)
    st0, m0 = step0(st0, jnp.asarray(batch))

    st1 = make_state()
    padded, true_n = pad_to_multiple(batch, 8)
    assert padded.shape[0] == 72 and true_n == 71
    pstep = make_padded_train_step(model, loss_cfg, opt, disc=disc,
                                   disc_optimizer=disc_opt, mesh=mesh,
                                   donate=False, state=st1)
    st1, m1 = pstep(st1, shard_batch(padded, mesh), np.int32(true_n))

    # FactorVAE's permutation drawn over 35 vs 36-row z2 differs by design
    # (the masked draw is a different random permutation, same distribution)
    skip = {"discrim_loss"} if loss_cfg.needs_discriminator else set()
    for k in set(m0) - skip:
        assert float(m0[k]) == pytest.approx(float(m1[k]), rel=1e-4,
                                             abs=1e-4), k
    if not loss_cfg.needs_discriminator:
        for a, b in zip(jax.tree_util.tree_leaves(st0.params),
                        jax.tree_util.tree_leaves(st1.params)):
            # atol bound: a near-zero grad element under Adam's step-1
            # m/sqrt(v) normalization can move a param by O(lr * eps-ratio)
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-4)


def test_mesh_trainer_ragged_multiepoch_equals_single_device(tmp_path,
                                                             tiny_dataset):
    """3 epochs of the data-parallel Trainer with drop_last=False (final
    batch of 26 rows does NOT divide the 8-way axis -> exercises the padded
    step every epoch) must match the single-device Trainer: same logged
    losses and the same parameters. Gates VERDICT items 1/2/9."""
    from disvae_tpu.data.datasets import ArrayDataset
    from disvae_tpu.parallel.mesh import create_mesh

    ds = ArrayDataset(tiny_dataset.imgs[:90])  # 90 = 32+32+26
    cfg = L.BtcvaeLoss(n_data=90, alpha=1, beta=6, gamma=1, steps_anneal=20)

    def run(mesh, save_dir):
        loader = DataLoader(ds, batch_size=32, shuffle=True, seed=0)
        model, params = init_specific_model("Burgess", ds.img_size, 10,
                                            key=jax.random.PRNGKey(0))
        trainer = Trainer(model, params, cfg, lr=1e-3,
                          rng=jax.random.PRNGKey(1), save_dir=str(save_dir),
                          is_progress_bar=False, mesh=mesh)
        trainer(loader, epochs=3, checkpoint_every=100)
        log = open(os.path.join(str(save_dir), "train_losses.log")).read()
        return trainer.state, log

    d1 = tmp_path / "single"; d1.mkdir()
    d8 = tmp_path / "mesh"; d8.mkdir()
    state1, log1 = run(None, d1)
    state8, log8 = run(create_mesh(), d8)

    assert int(state1.step) == int(state8.step) == 9
    # identical log schema, near-identical values
    rows1 = [l.split(",") for l in log1.strip().split("\n")[1:]]
    rows8 = [l.split(",") for l in log8.strip().split("\n")[1:]]
    assert [r[:2] for r in rows1] == [r[:2] for r in rows8]
    for r1, r8 in zip(rows1, rows8):
        assert float(r1[2]) == pytest.approx(float(r8[2]), rel=1e-3,
                                             abs=1e-3), (r1, r8)
    for a, b in zip(jax.tree_util.tree_leaves(state1.params),
                    jax.tree_util.tree_leaves(state8.params)):
        # ~5e-5 fp-reassociation drift per step compounds over 9 steps
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-3)


def test_host_slice_union_is_global_permutation(tiny_dataset):
    """Simulated 2-process feeding: the union of both hosts' slices of every
    batch is exactly the global permutation a single-process loader draws
    (multi-host feed contract, disvae_tpu/parallel/distributed.py)."""
    full = DataLoader(tiny_dataset, batch_size=32, shuffle=True, seed=7)
    parts = [DataLoader(tiny_dataset, batch_size=32, shuffle=True, seed=7,
                        host_slice=(i, 2)) for i in range(2)]
    global_batches = [b for b, _ in full]
    part_batches = [[b for b, _ in p] for p in parts]
    assert len(part_batches[0]) == len(global_batches)
    for k, gb in enumerate(global_batches):
        union = np.concatenate([part_batches[0][k], part_batches[1][k]])
        np.testing.assert_array_equal(union, gb)


def test_factor_tail_of_one_fails_fast_or_skips_when_opted_in(tmp_path,
                                                              tiny_dataset):
    """FactorVAE with a ragged tail of exactly 1 sample: the two-half split
    has an empty half (reference losses.py:246-251 crashes there; the
    masked surrogate would 0/0 to NaN). Default Trainer matches the
    reference's fail-fast contract and raises; with skip_tiny_tail=True
    (what the CLI sets) the sample is skipped with a warning and params
    stay finite — on both the plain and the mesh path."""
    from disvae_tpu.data.datasets import ArrayDataset
    from disvae_tpu.parallel.mesh import create_mesh

    ds = ArrayDataset(tiny_dataset.imgs[:65])  # 65 = 2*32 + 1
    cfg = L.FactorKLoss(latent_dim=10, gamma=6.0, steps_anneal=0)
    for mesh in (None, create_mesh()):
        model, params = init_specific_model("Burgess", ds.img_size, 10,
                                            key=jax.random.PRNGKey(0))
        loader = DataLoader(ds, batch_size=32, shuffle=True, seed=0)

        # library default: fail fast like the reference
        trainer = Trainer(model, params, cfg, lr=1e-3,
                          rng=jax.random.PRNGKey(1),
                          save_dir=str(tmp_path / ("strict-%s" % (mesh is
                                                                  None))),
                          is_progress_bar=False, mesh=mesh,
                          resident="never")
        with pytest.raises(ValueError, match="empty half"):
            trainer(loader, epochs=1, checkpoint_every=100)
        # the contract violation is static (len(dataset) mod batch), so it
        # must raise BEFORE any batch is dispatched — not after wasting an
        # epoch of full batches (state.step is a device scalar; fetching it
        # is fine on the CPU test platform)
        assert int(np.asarray(trainer.state.step)) == 0

        # opt-in skip (the CLI's behavior): warn, drop the sample, stay
        # finite
        model, params = init_specific_model("Burgess", ds.img_size, 10,
                                            key=jax.random.PRNGKey(0))
        trainer = Trainer(model, params, cfg, lr=1e-3,
                          rng=jax.random.PRNGKey(1),
                          save_dir=str(tmp_path / ("skip-%s" % (mesh is
                                                                None))),
                          is_progress_bar=False, mesh=mesh,
                          resident="never", skip_tiny_tail=True)
        trainer(loader, epochs=1, checkpoint_every=100)
        for leaf in jax.tree_util.tree_leaves(trainer.state.params):
            assert np.isfinite(np.asarray(leaf)).all()
        assert trainer._host_step == 2  # tail skipped: 2 full steps only


def test_host_slice_padded_equal_shares(tiny_dataset):
    """SPMD multi-host contract (DataLoader.pad_global_to): every host
    yields the SAME number of equally-sized shares; their concatenation is
    the global batch padded at the END to the data-axis multiple (pad rows
    repeat the last row), so the mask-aware padded step's first-true_n-rows
    mask stays correct."""
    bs, m, pn = 28, 8, 2  # 96 = 28*3 + 12; 28 % 8 = 4, 12 % 8 = 4
    full = DataLoader(tiny_dataset, batch_size=bs, shuffle=True, seed=7)
    parts = [DataLoader(tiny_dataset, batch_size=bs, shuffle=True, seed=7,
                        host_slice=(i, pn), pad_global_to=m)
             for i in range(pn)]
    global_batches = [b for b, _ in full]
    part_batches = [[b for b, _ in p] for p in parts]
    sizes = full.global_batch_sizes()
    assert sizes == [28, 28, 28, 12]
    assert len(part_batches[0]) == len(part_batches[1]) == len(global_batches)
    for k, gb in enumerate(global_batches):
        padded_n = -(-sizes[k] // m) * m
        assert part_batches[0][k].shape == part_batches[1][k].shape
        assert part_batches[0][k].shape[0] == padded_n // pn
        union = np.concatenate([part_batches[0][k], part_batches[1][k]])
        expect = np.concatenate(
            [gb, np.repeat(gb[-1:], padded_n - sizes[k], axis=0)])
        np.testing.assert_array_equal(union, expect)


def test_host_slice_padded_trainer_equals_plain(tmp_path, tiny_dataset):
    """Degenerate 1-process 'multi-host' feed (host_slice=(0,1) +
    pad_global_to): the mesh Trainer must produce the same parameters and
    logs as the plain mesh path — the loader pre-pads and the prefetcher
    takes the global-true-size branch, so this gates that n_valid comes
    from the GLOBAL batch structure, not the local share size."""
    from disvae_tpu.data.datasets import ArrayDataset
    from disvae_tpu.parallel.mesh import create_mesh

    ds = ArrayDataset(tiny_dataset.imgs[:90])  # ragged tail of 26
    cfg = L.BtcvaeLoss(n_data=90, alpha=1, beta=6, gamma=1, steps_anneal=20)

    def run(save_dir, force_multihost=False, **loader_kw):
        loader = DataLoader(ds, batch_size=32, shuffle=True, seed=0,
                            **loader_kw)
        model, params = init_specific_model("Burgess", ds.img_size, 10,
                                            key=jax.random.PRNGKey(0))
        trainer = Trainer(model, params, cfg, lr=1e-3,
                          rng=jax.random.PRNGKey(1), save_dir=str(save_dir),
                          is_progress_bar=False, mesh=create_mesh(),
                          resident="never")  # exercise the streaming feed
        # the prefetcher's multihost branch is keyed on process_count; force
        # it for the degenerate 1-process case (local == global there)
        trainer._force_multihost = force_multihost
        trainer(loader, epochs=2, checkpoint_every=100)
        log = open(os.path.join(str(save_dir), "train_losses.log")).read()
        return trainer.state, log

    d1 = tmp_path / "plain"; d1.mkdir()
    d2 = tmp_path / "hosted"; d2.mkdir()
    state_a, log_a = run(d1)
    state_b, log_b = run(d2, force_multihost=True,
                         host_slice=(0, 1), pad_global_to=8)
    assert log_a == log_b
    for a, b in zip(jax.tree_util.tree_leaves(state_a.params),
                    jax.tree_util.tree_leaves(state_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_mesh_trainer_resume_with_ragged(tmp_path, tiny_dataset):
    """Checkpoint/resume still works under the mesh, and the truncating
    LossesLogger leaves exactly one row set per epoch."""
    from disvae_tpu.data.datasets import ArrayDataset
    from disvae_tpu.parallel.mesh import create_mesh

    ds = ArrayDataset(tiny_dataset.imgs[:90])
    cfg = L.BetaHLoss(beta=1, steps_anneal=0)
    mesh = create_mesh()

    def fresh(resume=False):
        model, params = init_specific_model("Burgess", ds.img_size, 10,
                                            key=jax.random.PRNGKey(0))
        return Trainer(model, params, cfg, lr=1e-3,
                       rng=jax.random.PRNGKey(1), save_dir=str(tmp_path),
                       is_progress_bar=False, mesh=mesh, resume=resume)

    loader = lambda: DataLoader(ds, batch_size=32, shuffle=True, seed=0)
    t_a = fresh()
    t_a(loader(), epochs=2, checkpoint_every=1)
    t_b = fresh(resume=True)
    assert t_b._start_epoch == 2
    lb = loader(); lb._epoch = 2
    t_b(lb, epochs=4, checkpoint_every=1)
    log = open(tmp_path / "train_losses.log").read()
    assert log.count("\n0,loss,") == 1
    assert int(t_b.state.step) == 12


@pytest.mark.parametrize("mesh_on", [False, True], ids=["single", "mesh"])
def test_resident_feed_matches_streaming(tmp_path, tiny_dataset, mesh_on):
    """The HBM-resident dataset feed (one device transfer, epochs fed by
    index; data/resident.py) must reproduce the streaming pipeline's losses
    and params exactly: same DataLoader.epoch_order permutation, same wire
    format, same steps — including the ragged 26-row tail (90 % 32)."""
    from disvae_tpu.data.datasets import ArrayDataset
    from disvae_tpu.parallel.mesh import create_mesh

    imgs = tiny_dataset.imgs[:90]
    cfg = L.BtcvaeLoss(n_data=90, alpha=1, beta=6, gamma=1, steps_anneal=20)
    mesh = create_mesh() if mesh_on else None

    def run(resident):
        ds = ArrayDataset(imgs)
        loader = DataLoader(ds, batch_size=32, shuffle=True, seed=0)
        model, params = init_specific_model("Burgess", ds.img_size, 10,
                                            key=jax.random.PRNGKey(0))
        tr = Trainer(model, params, cfg, lr=1e-3,
                     rng=jax.random.PRNGKey(1), save_dir=str(tmp_path),
                     is_progress_bar=False, mesh=mesh, resident=resident)
        losses = [tr._train_epoch(loader, e)[0] for e in range(2)]
        return losses, tr.state

    l_stream, s_stream = run("never")
    l_res, s_res = run("always")
    for a, b in zip(l_stream, l_res):
        assert a == pytest.approx(b, rel=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(s_stream.params),
                    jax.tree_util.tree_leaves(s_res.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3)
    assert int(s_stream.step) == int(s_res.step) == 6


def test_pipelined_epochs_match_sequential(tmp_path, tiny_dataset):
    """__call__'s epoch pipelining (fetch epoch N's metrics only after
    dispatching epoch N+1; hides the device->host round-trip behind compute)
    must be invisible in every artifact: identical train_losses.log CSV,
    identical final params and step counter vs pipeline_epochs=False.
    Exercises deferral across epochs 1..2 (checkpoint_every=10 keeps them
    unflushed), the checkpoint-epoch flush at 0, the last-epoch flush, and
    the ragged 26-row tail (90 % 32)."""
    from disvae_tpu.data.datasets import ArrayDataset

    imgs = tiny_dataset.imgs[:90]
    cfg = L.BtcvaeLoss(n_data=90, alpha=1, beta=6, gamma=1, steps_anneal=20)

    def run(pipelined):
        save = tmp_path / ("pipe" if pipelined else "seq")
        save.mkdir()
        ds = ArrayDataset(imgs)
        loader = DataLoader(ds, batch_size=32, shuffle=True, seed=0)
        model, params = init_specific_model("Burgess", ds.img_size, 10,
                                            key=jax.random.PRNGKey(0))
        tr = Trainer(model, params, cfg, lr=1e-3,
                     rng=jax.random.PRNGKey(1), save_dir=str(save),
                     is_progress_bar=False, resident="always",
                     pipeline_epochs=pipelined)
        tr(loader, epochs=4, checkpoint_every=10)
        return tr, (save / "train_losses.log").read_text()

    tr_seq, csv_seq = run(False)
    tr_pipe, csv_pipe = run(True)
    assert csv_pipe == csv_seq
    assert tr_pipe._host_step == tr_seq._host_step == 12
    for a, b in zip(jax.tree_util.tree_leaves(tr_seq.state.params),
                    jax.tree_util.tree_leaves(tr_pipe.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_resident_feed_rekeys_on_new_dataset(tmp_path, tiny_dataset):
    """A Trainer whose resident feed was built for one dataset must rebuild
    it when driven with a different loader (advisor finding r2: the cached
    wire array was keyed once per Trainer, so a second dataset's indices
    gathered out of the FIRST dataset's rows). Gate: an epoch over dataset
    B after an epoch over dataset A produces the same params as a fresh
    trainer stepped over A then B with the streaming feed."""
    from disvae_tpu.data.datasets import ArrayDataset

    ds_a = ArrayDataset(tiny_dataset.imgs[:64])
    ds_b = ArrayDataset((255 - tiny_dataset.imgs[:64]))  # distinct content
    cfg = L.BetaHLoss(beta=1, steps_anneal=0)

    def run(resident):
        model, params = init_specific_model("Burgess", ds_a.img_size, 10,
                                            key=jax.random.PRNGKey(0))
        tr = Trainer(model, params, cfg, lr=1e-3,
                     rng=jax.random.PRNGKey(1), save_dir=str(tmp_path),
                     is_progress_bar=False, resident=resident)
        tr._train_epoch(DataLoader(ds_a, batch_size=32, shuffle=True,
                                   seed=0), 0)
        wire_a = tr._resident.wire if tr._resident is not None else None
        tr._train_epoch(DataLoader(ds_b, batch_size=32, shuffle=True,
                                   seed=0), 0)
        if resident == "always":
            assert tr._resident is not None
            assert tr._resident.wire is not wire_a  # rebuilt for ds_b
        return tr.state

    s_stream = run("never")
    s_res = run("always")
    for a, b in zip(jax.tree_util.tree_leaves(s_stream.params),
                    jax.tree_util.tree_leaves(s_res.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3)


def test_traced_coefs_one_program_serves_all_values():
    """Sweep-compile-once (ops/losses.py coef_vector): a train step BUILT
    for alpha=1 must, when fed a state carrying alpha=5's coef vector,
    produce exactly what a step built for alpha=5 produces — the
    hyperparameters are traced operands, not baked constants, so per-alpha
    sweep processes share one compiled program (and one persistent-cache
    entry) instead of paying a multi-minute XLA compile per value."""
    from disvae_tpu.train.state import create_train_state
    from disvae_tpu.train.steps import make_optimizer, make_train_step

    cfg1 = L.BtcvaeLoss(n_data=64, alpha=1, beta=6, gamma=1, steps_anneal=0)
    cfg5 = L.BtcvaeLoss(n_data=64, alpha=5, beta=6, gamma=1, steps_anneal=0)
    model, params = init_specific_model("Burgess", (1, 32, 32), 10,
                                        key=jax.random.PRNGKey(0))
    opt = make_optimizer(1e-3)
    batch = np.random.RandomState(0).rand(16, 32, 32, 1).astype(np.float32)

    def fresh_state(cfg):
        return create_train_state(model, params, opt, jax.random.PRNGKey(1),
                                  loss_cfg=cfg)

    step_for_1 = make_train_step(model, cfg1, opt, donate=False)
    step_for_5 = make_train_step(model, cfg5, opt, donate=False)

    # same program, alpha delivered via the state's coef vector
    st_a = fresh_state(cfg1).replace(coefs=L.coef_vector(cfg5))
    new_a, metrics_a = step_for_1(st_a, batch)
    new_b, metrics_b = step_for_5(fresh_state(cfg5), batch)

    for k in metrics_b:
        np.testing.assert_allclose(np.asarray(metrics_a[k]),
                                   np.asarray(metrics_b[k]), rtol=1e-6,
                                   err_msg=k)
    for a, b in zip(jax.tree_util.tree_leaves(new_a.params),
                    jax.tree_util.tree_leaves(new_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)

    # and the alpha=1 state reuses the SAME executable (no retrace)
    step_for_1(fresh_state(cfg1), batch)
    if hasattr(step_for_1, "_cache_size"):
        assert step_for_1._cache_size() == 1


@pytest.mark.parametrize("impl", ["pc", "pl"])
def test_final_convt_hook_step_bitexact_under_parity(impl):
    """Swapping the final decoder convT via burgess.set_final_convt_impl
    (the benchmarks/scaling.py DISVAE_CONVT3 A/B hook) must leave a full
    btcvae train step BITWISE identical under the parity policy — both
    custom ops emit autodiff's exact primitives there."""
    from disvae_tpu.models import burgess
    from disvae_tpu.ops import pallas_convt_bwd as pcb
    from disvae_tpu.ops.convs import conv2d_transpose_pc
    from disvae_tpu.train.state import create_train_state
    from disvae_tpu.train.steps import make_optimizer, make_train_step

    cfg = L.BtcvaeLoss(n_data=96, alpha=1, beta=6, gamma=1, steps_anneal=0)
    opt = make_optimizer(1e-3)
    batch = jax.numpy.asarray(
        np.random.RandomState(1).rand(16, 32, 32, 1).astype(np.float32))

    def run():
        model, params = init_specific_model("Burgess", (1, 32, 32), 10,
                                            key=jax.random.PRNGKey(0))
        state = create_train_state(model, params, opt, jax.random.PRNGKey(1))
        step = make_train_step(model, cfg, opt, donate=False)
        s, m = step(state, batch)
        return s, {k: float(v) for k, v in m.items()}

    s_ref, m_ref = run()
    fn = conv2d_transpose_pc if impl == "pc" else pcb.conv2d_transpose_pl
    burgess.set_final_convt_impl(fn)
    try:
        s_got, m_got = run()
    finally:
        burgess.set_final_convt_impl(burgess.conv2d_transpose)
    assert m_got == m_ref
    for a, b in zip(jax.tree_util.tree_leaves(s_ref.params),
                    jax.tree_util.tree_leaves(s_got.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("loss_cfg", [
    L.FactorKLoss(gamma=6, latent_dim=10, lr_disc=5e-5, steps_anneal=0),
    L.BtcvaeLoss(n_data=33, alpha=1, beta=6, gamma=1, steps_anneal=0),
], ids=["factor", "btcvae-mss"])
def test_tiny_tail_raises_by_default(tmp_path, loss_cfg):
    """A ragged final batch of ONE sample is undefined for FactorVAE and
    btcvae-MSS; the reference fails fast (losses.py:246-251, math.py:54-73)
    and so does the library Trainer by default."""
    from disvae_tpu.data.datasets import ArrayDataset
    imgs = (np.random.RandomState(0).rand(33, 32, 32, 1) * 255) \
        .astype(np.uint8)
    ds = ArrayDataset(imgs)
    loader = DataLoader(ds, batch_size=16, shuffle=True, seed=0)
    model, params = init_specific_model("Burgess", ds.img_size, 10,
                                        key=jax.random.PRNGKey(0))
    trainer = Trainer(model, params, loss_cfg, lr=1e-3,
                      rng=jax.random.PRNGKey(1),
                      save_dir=str(tmp_path), is_progress_bar=False)
    with pytest.raises(ValueError, match="tail|half|M = B-1|sample"):
        trainer(loader, epochs=1, checkpoint_every=10)


def test_tiny_tail_optin_skips_with_warning(tmp_path, caplog):
    """skip_tiny_tail=True (the CLI's setting) drops the 1-sample batch
    loudly and keeps training; losses that ARE defined on a single sample
    (plain VAE) never skip."""
    import logging

    from disvae_tpu.data.datasets import ArrayDataset
    imgs = (np.random.RandomState(0).rand(33, 32, 32, 1) * 255) \
        .astype(np.uint8)
    ds = ArrayDataset(imgs)
    cfg = L.BtcvaeLoss(n_data=33, alpha=1, beta=6, gamma=1, steps_anneal=0)
    loader = DataLoader(ds, batch_size=16, shuffle=True, seed=0)
    model, params = init_specific_model("Burgess", ds.img_size, 10,
                                        key=jax.random.PRNGKey(0))
    trainer = Trainer(model, params, cfg, lr=1e-3,
                      rng=jax.random.PRNGKey(1),
                      save_dir=str(tmp_path), is_progress_bar=False,
                      skip_tiny_tail=True)
    with caplog.at_level(logging.WARNING):
        trainer(loader, epochs=1, checkpoint_every=10)
    assert any("Skipping a final batch" in r.message for r in caplog.records)

    # betaH is defined on one sample: trains the tail, no skip, no raise
    cfg_ok = L.BetaHLoss(beta=1, steps_anneal=0)
    model, params = init_specific_model("Burgess", ds.img_size, 10,
                                        key=jax.random.PRNGKey(0))
    trainer = Trainer(model, params, cfg_ok, lr=1e-3,
                      rng=jax.random.PRNGKey(1),
                      save_dir=str(tmp_path / "ok"), is_progress_bar=False)
    trainer(loader, epochs=1, checkpoint_every=10)
