"""CLI glue smoke tests (CPU): main_viz end-to-end over a saved run."""

import os
import sys

import numpy as np
import pytest

import jax


def test_main_viz_cli_all_plots(tmp_path, monkeypatch):
    """main_viz.main renders every plot family from a freshly saved model
    using a fabricated mnist cache."""
    from disvae_tpu.data import datasets as D
    from disvae_tpu.models.vae import init_specific_model
    from disvae_tpu.utils.modelIO import save_model, save_metadata
    from disvae_tpu import cli as main_mod
    from disvae_tpu import cli_viz as main_viz

    # fabricate the mnist cache in an isolated DATA_ROOT
    root = tmp_path / "data" / "mnist"
    os.makedirs(root)
    rng = np.random.RandomState(0)
    np.savez_compressed(root / "train32.npz",
                        imgs=(rng.rand(64, 32, 32, 1) * 255).astype(np.uint8),
                        labels=rng.randint(0, 10, 64))
    monkeypatch.setattr(D, "DATA_ROOT", str(tmp_path / "data"))

    res_dir = tmp_path / "results"
    run_dir = res_dir / "cli_run"
    os.makedirs(run_dir)
    monkeypatch.setattr(main_mod, "RES_DIR", str(res_dir))
    monkeypatch.setattr(main_viz, "RES_DIR", str(res_dir))

    model, params = init_specific_model("Burgess", (1, 32, 32), 10,
                                        key=jax.random.PRNGKey(0))
    save_model(model, params, str(run_dir),
               metadata=dict(dataset="mnist", img_size=[1, 32, 32],
                             latent_dim=10, model_type="Burgess"))
    with open(run_dir / "train_losses.log", "w") as f:
        f.write("Epoch,Loss,Value\n")
        for d in range(10):
            f.write("0,kl_loss_{},{}\n".format(d, d * 0.1))

    args = main_viz.parse_arguments(
        ["cli_run", "all", "-s", "1", "-r", "4", "-c", "4"])
    main_viz.main(args)

    for f in ["samples.png", "data_samples.png", "reconstruct.png",
              "prior_traversals.png", "reconstruct_traverse.png",
              "posterior_traversals.gif"]:
        assert os.path.exists(run_dir / f), f


def test_main_cli_trains_data_parallel_on_mesh(tmp_path, monkeypatch):
    """main.main() end-to-end on the 8-virtual-device mesh (VERDICT item 1):
    the CLI must build the mesh itself, train data-parallel through the real
    Trainer path including a ragged final batch (90 % 32 = 26, indivisible
    by 8 -> padded mask-aware step), evaluate, and write the full artifact
    set."""
    import csv
    from disvae_tpu.data import datasets as D
    from disvae_tpu import cli as main_mod

    root = tmp_path / "data" / "mnist"
    os.makedirs(root)
    rng = np.random.RandomState(0)
    np.savez_compressed(root / "train32.npz",
                        imgs=(rng.rand(90, 32, 32, 1) * 255).astype(np.uint8),
                        labels=rng.randint(0, 10, 90))
    monkeypatch.setattr(D, "DATA_ROOT", str(tmp_path / "data"))
    monkeypatch.chdir(tmp_path)

    assert jax.device_count() == 8
    args = main_mod.parse_arguments(
        ["mesh_run", "-d", "mnist", "-l", "btcvae", "-e", "2", "-b", "32",
         "--lr", "1e-3", "-z", "10", "--no-progress-bar", "-s", "1234",
         "--checkpoint-every", "1", "--eval-batchsize", "64"])
    main_mod.main(args)

    run_dir = tmp_path / "results" / "mesh_run"
    for f in ["model.npz", "specs.json", "train_losses.log",
              "test_losses.log", "training.gif"]:
        assert os.path.exists(run_dir / f), f
    with open(run_dir / "train_losses.log") as f:
        rows = [r for r in csv.DictReader(f)]
    losses = [float(r["Value"]) for r in rows if r["Loss"] == "loss"]
    assert losses and all(np.isfinite(losses))


def test_main_cli_no_viz_gif(tmp_path, monkeypatch):
    """--no-viz-gif skips the per-epoch traversal gif (so the trainer's
    pipelined epoch path stays engaged) while every other artifact is still
    written."""
    from disvae_tpu.data import datasets as D
    from disvae_tpu import cli as main_mod

    root = tmp_path / "data" / "mnist"
    os.makedirs(root)
    rng = np.random.RandomState(0)
    np.savez_compressed(root / "train32.npz",
                        imgs=(rng.rand(64, 32, 32, 1) * 255).astype(np.uint8),
                        labels=rng.randint(0, 10, 64))
    monkeypatch.setattr(D, "DATA_ROOT", str(tmp_path / "data"))
    monkeypatch.chdir(tmp_path)

    args = main_mod.parse_arguments(
        ["nogif_run", "-d", "mnist", "-l", "betaH", "-e", "1", "-b", "32",
         "--no-progress-bar", "-s", "1234", "--no-test", "--no-viz-gif",
         "--no-mesh"])
    main_mod.main(args)

    run_dir = tmp_path / "results" / "nogif_run"
    for f in ["model.npz", "specs.json", "train_losses.log"]:
        assert os.path.exists(run_dir / f), f
    assert not os.path.exists(run_dir / "training.gif")
