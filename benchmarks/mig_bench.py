"""MIG/AAM evaluation wall-clock benchmark (BASELINE.md: "MIG eval
wall-clock — tracked metric (minimize)"). Prints ONE JSON line.

Measures the production metrics path exactly as the CLI runs it
(`main.py <name> --is-metrics`): full-dataset encode of the 737,280-image
dsprites lattice (bitpacked wire feed, on-device decompress) + the marginal
entropy + the 113 conditional entropies (streaming blocked logsumexp,
vectorized per factor). Reference counterpart: evaluate.py:119-317, the
wall-clock-dominant eval the reference README calls "slow".

Weights are freshly initialized — MIG's VALUE is meaningless here, but the
wall-clock is identical to a trained model's (same shapes, same programs).

Run standalone (`python benchmarks/mig_bench.py`) or via bench.py, which
executes it as a SEPARATE process before touching the TPU itself (one
process per numeric policy / program family — see the verify skill's tunnel
notes).
"""

import json
import logging
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _progress  # noqa: E402  (repo root on sys.path above)

EVAL_BATCH = 1000  # the CLI's eval_batchsize default (hyperparam.ini)


def main():
    from disvae_tpu.data.datasets import DSprites, DataLoader
    from disvae_tpu.models.vae import init_specific_model
    from disvae_tpu.ops.losses import BetaHLoss
    from disvae_tpu.train.evaluate import Evaluator

    root = os.path.join(os.environ.get(
        "DISVAE_DATA_ROOT", os.path.join(os.getcwd(), "data")), "dsprites")
    if not os.path.exists(os.path.join(root, "dsprites_imgs.npy")):
        _progress("fabricating full-size dsprites cache (one-time)...")
        import subprocess
        subprocess.run([sys.executable,
                        os.path.join(os.path.dirname(os.path.dirname(
                            os.path.abspath(__file__))), "tools",
                            "fabricate_dsprites.py"), "--root", root],
                       check=True, stdout=subprocess.DEVNULL)

    ds = DSprites(root=root, logger=logging.getLogger("mig_bench"))
    loader = DataLoader(ds, batch_size=EVAL_BATCH, shuffle=False)
    model, params = init_specific_model("Burgess", (1, 64, 64), 10,
                                        key=jax.random.PRNGKey(0))
    ev = Evaluator(model, params, BetaHLoss(beta=1),
                   rng=jax.random.PRNGKey(1), is_progress_bar=False,
                   save_dir=os.environ.get("MIG_BENCH_DIR", "/tmp"))

    _progress("MIG eval over {} images (encode + 1 marginal + 113 "
              "conditional entropies)...".format(len(ds)))
    out = {}
    # MIG_BENCH_REPEAT=2 runs the full metrics pass twice in-process: the
    # first pass pays XLA compiles + the tunnel's first-execution latency
    # for each per-factor program family; the second is the warm steady
    # state (what a sweep/repeated eval pays). Both are reported.
    for rep in range(int(os.environ.get("MIG_BENCH_REPEAT", "1"))):
        t0 = time.perf_counter()
        metrics = ev.compute_metrics(loader)
        total = time.perf_counter() - t0
        t = ev.last_metrics_timings
        _progress("pass {}: {:.1f}s (encode {:.1f}s, entropies {:.1f}s)"
                  .format(rep, total, t["encode_seconds"],
                          t["entropy_seconds"]))
        key = "" if rep == 0 else "_warm"
        out["mig_eval_seconds" + key] = round(total, 1)
        out["mig_encode_seconds" + key] = round(t["encode_seconds"], 1)
        out["mig_entropy_seconds" + key] = round(t["entropy_seconds"], 1)
    out["mig_eval_images"] = len(ds)
    out["mig_value_untrained"] = round(metrics["MIG"], 4)
    # Pipeline sanity (VERDICT r4 weak #4): the timed pipeline must have
    # produced non-degenerate output — an encode regression that zeroed
    # q(z|x) would time identically but collapse the marginal entropies.
    H_z = np.asarray(ev.last_metrics_internals["marginal_entropies"])
    H_zCv = np.asarray(ev.last_metrics_internals["cond_entropies"])
    assert np.isfinite(H_z).all() and (np.abs(H_z) > 1e-6).all(), \
        "degenerate marginal entropies: {}".format(H_z)
    assert np.isfinite(H_zCv).all(), "non-finite conditional entropies"
    assert np.isfinite(metrics["MIG"]) and np.isfinite(metrics["AAM"])
    out["mig_pipeline_sanity"] = ("asserted: finite nonzero marginal "
                                  "entropies, finite cond entropies, "
                                  "finite MIG/AAM")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
