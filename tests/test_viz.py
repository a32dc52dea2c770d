"""Visualization tests: grid geometry, traversal math, artifact rendering."""

import os

import numpy as np
import pytest

import jax

from disvae_tpu.models.vae import init_specific_model
from disvae_tpu.utils.visualize import GifTraversalsTraining, Visualizer
from disvae_tpu.utils.viz_helpers import (concatenate_pad, make_grid,
                                          make_grid_img, read_loss_from_file)


def _write_kl_log(path, latent_dim=10, epochs=2):
    with open(path, "w") as f:
        f.write("Epoch,Loss,Value\n")
        for e in range(epochs):
            f.write("{},loss,{}\n".format(e, 100 - e))
            for d in range(latent_dim):
                f.write("{},kl_loss_{},{}\n".format(e, d, (d * 7) % 10 + e))


def test_make_grid_matches_torchvision_geometry():
    imgs = np.random.RandomState(0).rand(6, 8, 8, 1).astype(np.float32)
    grid = make_grid(imgs, nrow=3, padding=2, pad_value=1.0)
    # 2 rows x 3 cols of 8px cells with 2px padding everywhere
    assert grid.shape == (2 * 10 + 2, 3 * 10 + 2, 1)
    np.testing.assert_allclose(grid[2:10, 2:10, 0], imgs[0, :, :, 0])
    np.testing.assert_allclose(grid[12:20, 22:30, 0], imgs[5, :, :, 0])
    assert grid[0].max() == 1.0  # border is pad_value


def test_make_grid_img_uint8_rgb():
    imgs = np.zeros((4, 8, 8, 1), np.float32)
    out = make_grid_img(imgs, nrow=2)
    assert out.dtype == np.uint8 and out.shape[-1] == 3


def test_concatenate_pad():
    a = np.ones((4, 4), np.uint8)
    out = concatenate_pad([a, a], pad_size=2, pad_values=255, axis=1)
    assert out.shape == (4, 4 * 2 + 3 * 2)
    assert out[0, 0] == 255 and out[0, 2] == 1


def test_read_loss_from_file(tmp_path):
    p = str(tmp_path / "train_losses.log")
    _write_kl_log(p, latent_dim=4, epochs=3)
    vals = read_loss_from_file(p, "kl_loss_")
    # last epoch (2), ordered by dimension index
    assert vals == [(d * 7) % 10 + 2 for d in range(4)]


@pytest.fixture
def viz(tmp_path):
    model, params = init_specific_model("Burgess", (1, 32, 32), 10,
                                        key=jax.random.PRNGKey(0))
    _write_kl_log(str(tmp_path / "train_losses.log"))
    return Visualizer(model, params, "mnist", str(tmp_path),
                      loss_of_interest="kl_loss_", max_traversal=2)


def test_traversal_range_absolute_and_quantile(viz):
    lo, hi = viz._get_traversal_range()
    assert (lo, hi) == (-2, 2)  # max_traversal >= 0.5: absolute
    viz.max_traversal = 0.475
    lo2, hi2 = viz._get_traversal_range(mean=0, std=1)
    # reference quirk (visualize.py:83-92): ppf of the LOWER tail makes the
    # quantile interval come out reversed (positive, negative) — the sweep
    # runs high-to-low. Magnitude is the 95% two-sided quantile ~1.96.
    assert -2.0 < hi2 < -1.9
    assert lo2 == -hi2


def test_visualizer_renders_all_artifacts(viz, tmp_path):
    data = np.random.RandomState(0).rand(8, 32, 32, 1).astype(np.float32)
    viz.generate_samples(size=(2, 2))
    viz.data_samples(data, size=(2, 2))
    viz.reconstruct(data, size=(2, 4))
    viz.traversals(data=data[:1], is_reorder_latents=True, n_per_latent=3,
                   n_latents=4)
    viz.reconstruct_traverse(data, is_posterior=True, n_per_latent=3,
                             n_latents=4, is_show_text=True)
    viz.gif_traversals(data[:2], n_latents=3, n_per_gif=4)
    for f in ["samples.png", "data_samples.png", "reconstruct.png",
              "posterior_traversals.png", "reconstruct_traverse.png",
              "posterior_traversals.gif"]:
        assert os.path.exists(os.path.join(str(tmp_path), f)), f


def test_gif_traversals_training(tmp_path):
    model, params = init_specific_model("Burgess", (1, 32, 32), 4,
                                        key=jax.random.PRNGKey(0))
    gif = GifTraversalsTraining(model, "mnist", str(tmp_path),
                                n_per_latent=3)
    gif(params)
    gif(params)
    gif.save_reset()
    assert os.path.exists(os.path.join(str(tmp_path), "training.gif"))
    assert gif.images == []
