"""REAL multi-process integration test (VERDICT r2 item 1).

Spawns two actual OS processes, each one rank of a `jax.distributed` CPU
cluster with 4 virtual devices (8 global), and drives the production
training CLI (`main.main`) in both via tools/multihost_run.py. A third
single-process run with 8 local devices over the SAME fabricated dataset is
the ground truth: rank 0's artifacts must match it.

This is the one place the machinery that single-process simulations cannot
reach actually executes: `jax.distributed.initialize` with a live
coordination service, `make_array_from_process_local_data` over genuinely
non-addressable devices, cross-process gloo collectives inside the train
step, host-sliced feeding of a ragged final batch, and the rank-0-owns-all-
artifacts contract (no eval double-write).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

# Full-suite only: 2-process cluster spin-up costs minutes of subprocess
# budget; deselect together with `slow` for the fast inner loop.
pytestmark = pytest.mark.multihost

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tools", "multihost_run.py")

# 100 images at batch 16 -> ragged tail of 4, indivisible by the 8-device
# data axis: every epoch ends in the host-padded mask-aware step.
N_IMGS = 100
ARGS = ["mh", "-d", "mnist", "--loss", "betaH", "-e", "2", "-b", "16",
        "--checkpoint-every", "1", "--no-progress-bar", "-s", "1234",
        "-L", "info"]


def _fabricate_mnist(root, n=N_IMGS):
    d = os.path.join(root, "mnist")
    os.makedirs(d, exist_ok=True)
    rng = np.random.RandomState(0)
    imgs = np.zeros((n, 32, 32, 1), np.uint8)
    ys, xs = np.mgrid[0:32, 0:32]
    for i in range(n):
        cy, cx, r = rng.randint(8, 24), rng.randint(8, 24), rng.randint(3, 8)
        imgs[i, :, :, 0] = (((ys - cy) ** 2 + (xs - cx) ** 2) < r * r) * 255
    np.savez_compressed(os.path.join(d, "train32.npz"), imgs=imgs,
                        labels=rng.randint(0, 10, n))


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _spawn(cwd, data_root, extra_env):
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # the worker sets its own device count
    env["DISVAE_DATA_ROOT"] = data_root
    env["JAX_PLATFORMS"] = ""  # the worker pins cpu via jax.config
    env.update(extra_env)
    return subprocess.Popen(
        [sys.executable, WORKER] + ARGS, cwd=cwd, env=env,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)


def _read_log(path):
    """train_losses.log -> {(epoch, key): value}"""
    rows = {}
    with open(path) as f:
        assert f.readline().strip() == "Epoch,Loss,Value"
        for line in f:
            e, k, v = line.strip().split(",")
            rows[(int(e), k)] = float(v)
    return rows


@pytest.fixture(scope="module")
def runs(tmp_path_factory):
    """One 2-process cluster run + one single-process 8-device run."""
    base = tmp_path_factory.mktemp("mh")
    data_root = str(base / "data")
    _fabricate_mnist(data_root)

    # ---- 2-process cluster (4 local devices each, 8 global) ----
    cluster_dir = str(base / "cluster")
    os.makedirs(cluster_dir)
    coord = "localhost:{}".format(_free_port())
    procs = [
        _spawn(cluster_dir, data_root,
               {"DISVAE_MH_NPROCS": "2", "DISVAE_MH_PID": str(i),
                "DISVAE_MH_COORD": coord, "DISVAE_MH_LOCAL_DEVICES": "4"})
        for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, "rank {} failed:\n{}".format(i, out[-4000:])

    # ---- single-process ground truth: 8 local devices, same everything ----
    single_dir = str(base / "single")
    os.makedirs(single_dir)
    p = _spawn(single_dir, data_root,
               {"DISVAE_MH_NPROCS": "1", "DISVAE_MH_LOCAL_DEVICES": "8"})
    out, _ = p.communicate(timeout=600)
    assert p.returncode == 0, "single-process run failed:\n" + out[-4000:]

    return {"cluster": os.path.join(cluster_dir, "results", "mh"),
            "single": os.path.join(single_dir, "results", "mh"),
            "rank_logs": outs}


def test_cluster_ran_distributed(runs):
    """Both ranks actually formed a 2-process runtime (not a silent
    single-process fallback)."""
    for i, log in enumerate(runs["rank_logs"]):
        assert ("mh-worker: rank {}/2 up with 4 local / 8 global devices"
                .format(i)) in log, log[-2000:]


def test_train_losses_match_single_process(runs):
    got = _read_log(os.path.join(runs["cluster"], "train_losses.log"))
    expect = _read_log(os.path.join(runs["single"], "train_losses.log"))
    assert set(got) == set(expect)
    # identical GSPMD program, different collective implementations
    # (shared-memory vs gloo) -> equal to float tolerance, not bitwise
    for k, v in expect.items():
        assert got[k] == pytest.approx(v, rel=1e-4, abs=1e-5), (k, got[k], v)


def test_final_params_match_single_process(runs):
    a = np.load(os.path.join(runs["cluster"], "model.npz"))
    b = np.load(os.path.join(runs["single"], "model.npz"))
    assert set(a.files) == set(b.files)
    for k in a.files:
        np.testing.assert_allclose(a[k], b[k], rtol=1e-4, atol=1e-5,
                                   err_msg=k)


def test_eval_written_once_and_matches(runs):
    """Rank 0 wrote test_losses.log exactly once; rank 1 skipped the eval
    phase; values match the single-process run."""
    import json
    with open(os.path.join(runs["cluster"], "test_losses.log")) as f:
        got = json.load(f)
    with open(os.path.join(runs["single"], "test_losses.log")) as f:
        expect = json.load(f)
    assert set(got) == set(expect)
    for k, v in expect.items():
        assert got[k] == pytest.approx(v, rel=1e-4, abs=1e-5), k
    assert "skips evaluation" in runs["rank_logs"][1]
    assert "skips evaluation" not in runs["rank_logs"][0]


def test_full_artifact_set_from_rank0(runs):
    """The artifact contract (specs.json, checkpoints, training.gif) comes
    out of the cluster run intact — written by rank 0 only."""
    for f in ("model.npz", "model-0.npz", "model-1.npz", "specs.json",
              "train_losses.log", "test_losses.log", "training.gif",
              "train_state.msgpack"):
        assert os.path.exists(os.path.join(runs["cluster"], f)), f
