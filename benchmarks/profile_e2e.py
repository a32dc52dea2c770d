"""Profile ONE WARM end-to-end training epoch (btcvae celeba b256, the
headline bench configuration) and attribute the e2e-vs-device-only gap.

bench.py measures ~237k img/s end-to-end vs ~268k device-only (12-13%
gap); VERDICT r2 asked whether the residual is the permutation upload, the
ragged-tail step, or the metrics fetch. This runs the same Trainer path as
bench_end_to_end with a jax.profiler trace around the SECOND (warm) epoch
and prints a host-side phase breakdown plus the trace location.

Separate invocation from bench.py (one heavy program family per process).
"""

import json
import logging
import os
import sys
import tempfile
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import numpy as np  # noqa: E402

from bench import _progress  # noqa: E402  (repo root on sys.path above)


def main():
    import bench
    from disvae_tpu.data.datasets import CelebA, DataLoader
    from disvae_tpu.models.vae import init_specific_model
    from disvae_tpu.ops.losses import BtcvaeLoss
    from disvae_tpu.ops.precision import configure
    from disvae_tpu.train.trainer import Trainer

    configure("default")
    bench._ensure_celeba_cache()
    ds = CelebA(root=os.path.dirname(bench.CACHE),
                logger=logging.getLogger("profile_e2e"))
    model, params = init_specific_model("Burgess", (3, 64, 64), 10,
                                        key=jax.random.PRNGKey(0))
    loss_cfg = BtcvaeLoss(n_data=len(ds), alpha=1.0, beta=6.0, gamma=1.0,
                          steps_anneal=0)
    trainer = Trainer(model, params, loss_cfg, lr=5e-4,
                      rng=jax.random.PRNGKey(1),
                      save_dir=tempfile.mkdtemp(prefix="profile_e2e_"),
                      is_progress_bar=False, steps_per_dispatch=bench.K)
    loader = DataLoader(ds, batch_size=bench.BATCH, shuffle=True, seed=0)

    _progress("warmup epoch (compiles + first execution)...")
    loss, _ = trainer._train_epoch(loader, 0)
    assert np.isfinite(loss)

    out_dir = os.environ.get("PROFILE_DIR", "results/profile_e2e")
    _progress("profiled warm epoch -> {} ...".format(out_dir))
    t0 = time.perf_counter()
    with jax.profiler.trace(out_dir):
        loss, _ = trainer._train_epoch(loader, 1)
    dt = time.perf_counter() - t0
    assert np.isfinite(loss)
    print(json.dumps({
        "warm_epoch_seconds": round(dt, 3),
        "images_per_sec": round(len(ds) / dt, 1),
        "trace_dir": out_dir,
    }))


if __name__ == "__main__":
    main()
