"""Data pipeline tests (synthetic; real datasets are download-gated)."""

import numpy as np
import pytest

from disvae_tpu.data.datasets import (ArrayDataset, DataLoader, DATASETS,
                                      get_background, get_dataset,
                                      get_img_size)


def test_registry():
    assert DATASETS == ["mnist", "fashion", "dsprites", "celeba", "chairs"]
    assert get_img_size("mnist") == (1, 32, 32)
    assert get_img_size("dsprites") == (1, 64, 64)
    assert get_img_size("celeba") == (3, 64, 64)
    assert get_background("dsprites") == 0
    assert get_background("celeba") == 1
    with pytest.raises(ValueError):
        get_dataset("imagenet")


def test_dsprites_metadata():
    ds = get_dataset("dsprites")
    assert list(ds.lat_sizes) == [3, 6, 40, 32, 32]
    assert ds.lat_names == ("shape", "scale", "orientation", "posX", "posY")


def test_loader_batching():
    imgs = (np.random.RandomState(0).rand(50, 32, 32, 1) * 255).astype(
        np.uint8)
    ds = ArrayDataset(imgs)
    loader = DataLoader(ds, batch_size=16, shuffle=False)
    assert len(loader) == 4  # partial final batch kept
    batches = list(loader)
    assert batches[0][0].shape == (16, 32, 32, 1)
    assert batches[-1][0].shape == (2, 32, 32, 1)
    assert batches[0][0].dtype == np.float32
    assert batches[0][0].max() <= 1.0 and batches[0][0].min() >= 0.0


def test_loader_shuffle_reproducible():
    imgs = np.arange(40, dtype=np.uint8).reshape(40, 1, 1, 1) * 6
    l1 = DataLoader(ArrayDataset(imgs), batch_size=8, shuffle=True, seed=3)
    l2 = DataLoader(ArrayDataset(imgs), batch_size=8, shuffle=True, seed=3)
    b1 = np.concatenate([b for b, _ in l1])
    b2 = np.concatenate([b for b, _ in l2])
    assert np.array_equal(b1, b2)
    # second epoch differs from the first
    b1b = np.concatenate([b for b, _ in l1])
    assert not np.array_equal(b1, b1b)


def test_loader_drop_last():
    imgs = np.zeros((50, 8, 8, 1), np.uint8)
    loader = DataLoader(ArrayDataset(imgs), batch_size=16, drop_last=True)
    assert len(loader) == 3
    assert all(b.shape[0] == 16 for b, _ in loader)


def test_array_dataset_factors():
    """ArrayDataset can carry factor metadata for metric tests."""
    lat_sizes = [2, 3]
    imgs = np.zeros((6, 8, 8, 1), np.uint8)
    ds = ArrayDataset(imgs, lat_sizes=lat_sizes, lat_names=("a", "b"))
    assert list(ds.lat_sizes) == [2, 3]
    img, lab = ds[3]
    assert img.shape == (8, 8, 1)


def test_dsprites_loads_from_cache(tmp_path, monkeypatch):
    """The DSprites class reads the extracted .npy caches without touching
    the network; labels are the 6-vector latents_values."""
    import os
    root = str(tmp_path / "dsprites")
    os.makedirs(root)
    rng = np.random.RandomState(0)
    imgs = (rng.rand(24, 64, 64, 1) > 0.5).astype(np.uint8)
    lat = rng.rand(24, 6).astype(np.float32)
    np.save(os.path.join(root, "dsprites_imgs.npy"), imgs)
    np.save(os.path.join(root, "dsprites_latents.npy"), lat)

    ds = get_dataset("dsprites")(root=root)
    assert len(ds) == 24
    batch, labels = ds.get_batch(np.asarray([3, 0, 7]))
    assert batch.shape == (3, 64, 64, 1) and batch.dtype == np.float32
    # stored {0,1} values pass through unscaled
    assert set(np.unique(batch)) <= {0.0, 1.0}
    np.testing.assert_array_equal(labels, lat[[3, 0, 7]])


def test_mnist_loads_from_npz_cache(tmp_path):
    import os
    root = str(tmp_path / "mnist")
    os.makedirs(root)
    rng = np.random.RandomState(1)
    imgs = (rng.rand(10, 32, 32, 1) * 255).astype(np.uint8)
    np.savez_compressed(os.path.join(root, "train32.npz"), imgs=imgs,
                        labels=np.arange(10))
    ds = get_dataset("mnist")(root=root)
    batch, labels = ds.get_batch(np.asarray([5, 5]))
    assert batch.max() <= 1.0 and labels.tolist() == [5, 5]


def test_raw_batches_match_float_batches():
    """Wire-format uint8 batches decompress (on device) to exactly the
    float batches: u8 * (1/255) must equal the float path bit-for-bit."""
    rng = np.random.RandomState(0)
    imgs = rng.randint(0, 256, (40, 8, 8, 3), np.uint8)
    ds = ArrayDataset(imgs)
    idcs = np.asarray([3, 0, 39, 3])
    f, _ = ds.get_batch(idcs)
    r, _ = ds.get_batch_raw(idcs)
    assert r.dtype == np.uint8
    np.testing.assert_array_equal(r.astype(np.float32) * (1.0 / 255.0), f)


def test_raw_batches_dsprites_bitpacked(tmp_path):
    """dsprites is binary, so its wire format is 1 bit/pixel; the on-device
    unpack must reproduce the float batch exactly."""
    import os
    import jax.numpy as jnp
    from disvae_tpu.train.steps import _decompress_batch
    root = str(tmp_path / "dsprites")
    os.makedirs(root)
    imgs = (np.random.RandomState(0).rand(12, 64, 64, 1) > 0.5).astype(
        np.uint8)
    np.save(os.path.join(root, "dsprites_imgs.npy"), imgs)
    np.save(os.path.join(root, "dsprites_latents.npy"),
            np.zeros((12, 6), np.float32))
    ds = get_dataset("dsprites")(root=root)
    r, _ = ds.get_batch_raw(np.arange(12))
    assert r.shape == (12, 64 * 64 // 8)
    f, _ = ds.get_batch(np.arange(12))
    np.testing.assert_array_equal(
        np.asarray(_decompress_batch(jnp.asarray(r), (1, 64, 64))), f)


def test_loader_raw_mode():
    imgs = np.random.RandomState(1).randint(0, 256, (32, 8, 8, 1), np.uint8)
    loader = DataLoader(ArrayDataset(imgs), batch_size=16, raw=True)
    b, _ = next(iter(loader))
    assert b.dtype == np.uint8


def test_bitpacked_wire_format_roundtrip():
    """Binary datasets pack to 1 bit/pixel; the device-side unpack in the
    train step must reproduce the float batch exactly."""
    import jax.numpy as jnp
    from disvae_tpu.train.steps import _decompress_batch

    class BinaryDS(ArrayDataset):
        is_binary = True
        _scale = 1.0

    imgs = (np.random.RandomState(0).rand(10, 32, 32, 1) > 0.6).astype(
        np.uint8)
    ds = BinaryDS(imgs)
    idcs = np.asarray([7, 0, 3])
    packed, _ = ds.get_batch_raw(idcs)
    assert packed.shape == (3, 32 * 32 // 8) and packed.dtype == np.uint8
    unpacked = _decompress_batch(jnp.asarray(packed), (1, 32, 32))
    f, _ = ds.get_batch(idcs)
    np.testing.assert_array_equal(np.asarray(unpacked), f)
