"""Checkpoint save/load round-trips, including torch-format result dirs."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.conftest import REFERENCE_RESULTS, has_reference_results
from disvae_tpu.models.vae import init_specific_model
from disvae_tpu.utils.modelIO import (load_checkpoints, load_metadata,
                                      load_model, save_metadata, save_model,
                                      save_np_arrays, load_np_arrays)


def _tree_equal(a, b):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    return all(np.array_equal(np.asarray(x), np.asarray(y))
               for x, y in zip(la, lb))


def test_save_load_roundtrip(tmp_path, rng_key):
    model, params = init_specific_model("Burgess", (1, 32, 32), 10,
                                        key=rng_key)
    save_model(model, params, str(tmp_path))
    model2, params2 = load_model(str(tmp_path))
    assert model2.img_size == (1, 32, 32) and model2.latent_dim == 10
    assert _tree_equal(params, params2)


def test_save_with_metadata(tmp_path, rng_key):
    model, params = init_specific_model("Burgess", (3, 64, 64), 8,
                                        key=rng_key)
    meta = dict(img_size=[3, 64, 64], latent_dim=8, model_type="Burgess",
                dataset="celeba", lr=5e-4)
    save_model(model, params, str(tmp_path), metadata=meta)
    loaded = load_metadata(str(tmp_path))
    assert loaded == meta
    # specs.json is sorted + indented like the reference's
    raw = open(os.path.join(str(tmp_path), "specs.json")).read()
    assert raw.startswith("{\n    \"")


def test_load_checkpoints(tmp_path, rng_key):
    model, params = init_specific_model("Burgess", (1, 32, 32), 10,
                                        key=rng_key)
    save_model(model, params, str(tmp_path))  # writes specs.json
    save_model(model, params, str(tmp_path), filename="model-0.npz")
    save_model(model, params, str(tmp_path), filename="model-5.npz")
    cps = load_checkpoints(str(tmp_path))
    assert sorted(e for e, _ in cps) == [0, 5]


@pytest.mark.skipif(not has_reference_results(),
                    reason="reference checkpoints unavailable")
def test_load_reference_torch_dir():
    """load_model must read a torch-format reference results dir directly."""
    model, params = load_model(os.path.join(REFERENCE_RESULTS, "VAE_mnist"))
    assert model.img_size == (1, 32, 32)
    x = jnp.zeros((1, 32, 32, 1))
    recon, _, _ = model.apply(params, x, is_train=False)
    assert recon.shape == (1, 32, 32, 1)


def test_np_arrays_roundtrip(tmp_path):
    arrays = {"a": np.arange(6).reshape(2, 3), "b": np.float64(2.5)}
    save_np_arrays(arrays, str(tmp_path), "arr.json")
    loaded = load_np_arrays(str(tmp_path), "arr.json")
    assert np.array_equal(loaded["a"], arrays["a"])
    assert loaded["b"] == 2.5


def test_checkpoint_save_preserves_full_specs(tmp_path, rng_key):
    """A mid-training checkpoint (no metadata) must not erase the fully
    resolved config already in specs.json."""
    from disvae_tpu.models.vae import init_specific_model
    from disvae_tpu.utils.modelIO import (load_metadata, save_metadata,
                                          save_model)
    model, params = init_specific_model("Burgess", (1, 32, 32), 4,
                                        key=rng_key)
    save_metadata({"dataset": "mnist", "loss": "betaH",
                   "img_size": [1, 32, 32], "latent_dim": 4,
                   "model_type": "Burgess"}, str(tmp_path))
    save_model(model, params, str(tmp_path), filename="model-3.npz")
    meta = load_metadata(str(tmp_path))
    assert meta["dataset"] == "mnist" and meta["latent_dim"] == 4
