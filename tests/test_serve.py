"""Serving bundle + StableHLO export tests."""

import numpy as np

import jax

from disvae_tpu.models.vae import init_specific_model
from disvae_tpu.serve import (ServingModel, export_artifacts, load_artifact,
                              _pad_bucket)
from disvae_tpu.utils.modelIO import save_model


def _saved_dir(tmp_path):
    model, params = init_specific_model("Burgess", (1, 32, 32), 6,
                                        key=jax.random.PRNGKey(0))
    save_model(model, params, str(tmp_path))
    return model, params


def test_pad_bucket():
    assert _pad_bucket(1) == 1
    assert _pad_bucket(5) == 8
    assert _pad_bucket(100) == 256
    assert _pad_bucket(300) == 512


def test_serving_model_roundtrip(tmp_path):
    model, params = _saved_dir(tmp_path)
    sm = ServingModel.from_dir(str(tmp_path))
    imgs = np.random.RandomState(0).rand(5, 32, 32, 1).astype(np.float32)
    mu, logvar = sm.encode(imgs)
    assert mu.shape == (5, 6) and logvar.shape == (5, 6)
    rec = sm.decode(mu)
    assert rec.shape == (5, 32, 32, 1)
    assert np.array_equal(rec, sm.reconstruct(imgs))
    assert sm.sample(3, seed=1).shape == (3, 32, 32, 1)
    # padding must not change results vs a direct full-bucket call
    mu8, _ = sm.encode(np.repeat(imgs[:1], 8, axis=0))
    np.testing.assert_allclose(mu8[0], mu[0], atol=1e-6)


def test_serving_probe_cli(tmp_path, capsys):
    """tools/serving_probe.py (the chip-evidence probe behind
    artifacts/serving_probe_btcvae_celeba_tpu.json) runs end-to-end on the
    CPU mesh: its internal assertions (ragged bucket parity, [0,1] range,
    deserialized-StableHLO == live model) all execute, and it prints one
    well-formed JSON line."""
    import json

    from tools.serving_probe import main as probe_main

    res = tmp_path / "results" / "tiny"
    res.mkdir(parents=True)
    _saved_dir(res)
    probe_main(["tiny", "--requests", "8", "--res-dir",
                str(tmp_path / "results")])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["run"] == "tiny"
    assert set(out["shlo_bytes"]) == {"encoder.shlo", "decoder.shlo"}
    assert out["warm_ragged_encode_reconstruct_seconds"] > 0


def test_stablehlo_export_roundtrip(tmp_path):
    model, params = _saved_dir(tmp_path)
    paths = export_artifacts(str(tmp_path), batch_size=4)
    assert len(paths) == 2
    enc = load_artifact(paths[0])
    dec = load_artifact(paths[1])
    x = np.random.RandomState(1).rand(4, 32, 32, 1).astype(np.float32)
    mu, logvar = enc(x)
    mu_ref, logvar_ref = model.encode(params, x)
    np.testing.assert_allclose(np.asarray(mu), np.asarray(mu_ref), atol=1e-5)
    img = dec(np.asarray(mu))
    img_ref = model.decode(params, np.asarray(mu_ref))
    np.testing.assert_allclose(np.asarray(img), np.asarray(img_ref),
                               atol=1e-5)
