"""On-chip probe of the deployment surface (disvae_tpu/serve.py).

One TPU process (tunnel rule), driven against a trained results dir:

1. `ServingModel.from_dir` — jitted bucketed encode / fused reconstruct /
   prior sample, timed cold (compile) and warm, with ragged request sizes
   that exercise the bucket padding (no recompile on a second size within
   the same bucket).
2. `export_artifacts` — StableHLO serialization of the encoder/decoder —
   then `load_artifact` + execution of the DESERIALIZED functions, asserted
   equal to the live ServingModel outputs (the serving contract: the .shlo
   runs without this package's model code).

Prints one JSON line; tools/snapshot-able as evidence. Usage:
    python tools/serving_probe.py btcvae_celeba_tpu [--requests 64]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _fetch(x):
    # tunnel rule: sync via a >=1-d fetch, never a 0-d scalar
    return np.asarray(x)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("name", help="run name under results/")
    parser.add_argument("--requests", type=int, default=64)
    parser.add_argument("--res-dir", default=os.path.join(REPO, "results"))
    args = parser.parse_args(argv)

    from disvae_tpu.serve import ServingModel, export_artifacts, \
        load_artifact

    run_dir = os.path.join(args.res_dir, args.name)
    out = {"run": args.name}

    t0 = time.perf_counter()
    sm = ServingModel.from_dir(run_dir)
    c, h, w = sm.model.img_size
    rng = np.random.RandomState(0)
    reqs = rng.rand(args.requests, h, w, c).astype(np.float32)

    # cold: includes the bucket's compile
    t1 = time.perf_counter()
    mu, logvar = sm.encode(reqs)
    rec = sm.reconstruct(reqs)
    t2 = time.perf_counter()
    # warm, and a DIFFERENT ragged size inside the same bucket (no
    # recompile: the bucket pads it to the same compiled shape)
    ragged = reqs[: max(1, args.requests - 7)]
    mu2, _ = sm.encode(ragged)
    rec2 = sm.reconstruct(ragged)
    t3 = time.perf_counter()
    samples = sm.sample(8, seed=1)
    assert mu.shape == (args.requests, sm.model.latent_dim)
    assert rec.shape == reqs.shape and samples.shape == (8, h, w, c)
    assert np.allclose(mu2, mu[: ragged.shape[0]], atol=1e-5)
    assert np.allclose(rec2, rec[: ragged.shape[0]], atol=1e-5)
    assert np.isfinite(rec).all() and (0 <= rec).all() and (rec <= 1).all()
    out["load_seconds"] = round(t1 - t0, 2)
    out["cold_encode_reconstruct_seconds"] = round(t2 - t1, 2)
    out["warm_ragged_encode_reconstruct_seconds"] = round(t3 - t2, 3)

    # StableHLO export -> reload -> execute, equal to the live model
    t4 = time.perf_counter()
    paths = export_artifacts(run_dir, batch_size=args.requests)
    t5 = time.perf_counter()
    enc = load_artifact(os.path.join(run_dir, "encoder.shlo"))
    dec = load_artifact(os.path.join(run_dir, "decoder.shlo"))
    mu_x, logvar_x = (_fetch(a) for a in enc(reqs))
    rec_x = _fetch(dec(mu_x))
    t6 = time.perf_counter()
    assert np.allclose(mu_x, mu, atol=1e-5), np.abs(mu_x - mu).max()
    assert np.allclose(logvar_x, logvar, atol=1e-5)
    assert np.allclose(rec_x, rec, atol=1e-5), np.abs(rec_x - rec).max()
    out["export_seconds"] = round(t5 - t4, 2)
    out["reload_exec_seconds"] = round(t6 - t5, 2)
    out["shlo_bytes"] = {os.path.basename(p): os.path.getsize(p)
                         for p in paths}
    out["parity"] = ("deserialized StableHLO encoder/decoder match the "
                     "live ServingModel to 1e-5")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
