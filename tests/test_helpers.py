"""utils.helpers tests: results-dir lifecycle, seeding, CLI bound checks."""

import os

import numpy as np
import pytest

from disvae_tpu.utils.helpers import (check_bounds, create_safe_directory,
                                      get_n_param, set_seed)


def test_create_safe_directory_archives(tmp_path):
    d = str(tmp_path / "run")
    os.makedirs(d)
    with open(os.path.join(d, "old.txt"), "w") as f:
        f.write("x")
    create_safe_directory(d)
    assert os.path.isdir(d) and not os.listdir(d)  # fresh dir
    assert os.path.exists(d + ".zip")  # prior contents archived


def test_create_safe_directory_fresh(tmp_path):
    d = str(tmp_path / "new_run")
    create_safe_directory(d)
    assert os.path.isdir(d)
    assert not os.path.exists(d + ".zip")


def test_set_seed_deterministic():
    import jax
    k1 = set_seed(123)
    k2 = set_seed(123)
    assert np.array_equal(jax.random.key_data(k1), jax.random.key_data(k2))
    a = np.random.rand()
    set_seed(123)
    assert np.random.rand() == a  # numpy stream reseeded too
    assert set_seed(None) is None


def test_check_bounds():
    assert check_bounds("3", type=int, lb=1, name="x") == 3
    with pytest.raises(Exception):
        check_bounds("0", type=int, lb=1, is_inclusive=True, name="x")


def test_get_n_param():
    params = {"a": {"w": np.zeros((3, 4)), "b": np.zeros(4)}}
    assert get_n_param(params) == 16


def test_prefetcher_superbatch_grouping():
    from disvae_tpu.data.datasets import ArrayDataset, DataLoader
    from disvae_tpu.data.prefetch import DevicePrefetcher
    imgs = np.zeros((80, 8, 8, 1), np.uint8)  # 5 batches of 16
    loader = DataLoader(ArrayDataset(imgs), batch_size=16)
    out = list(DevicePrefetcher(loader, superbatch_k=2))
    shapes = [np.asarray(b).shape for b, _ in out]
    # 2 stacked pairs + 1 leftover single batch
    assert shapes == [(2, 16, 8, 8, 1), (2, 16, 8, 8, 1), (16, 8, 8, 1)]
