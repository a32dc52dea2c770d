"""Throughput scaling study: batch size x numeric policy, one chip.

Measures the device-resident btcvae training super-step (same machinery as
bench.py's device-only bound) across batch sizes and the three numeric
policies the CLI exposes:

  highest  - f32 MXU passes (the parity default; 6 passes per matmul)
  high     - 3-pass bf16 (~f32 accuracy at roughly half the parity cost;
             accuracy measured by tools/precision_parity_probe.py)
  default  - bf16 MXU passes over f32 activations (XLA's TPU default)
  bf16     - precision default + bfloat16 activations/params in the conv
             stack (model compute_dtype=bfloat16; heads/losses stay f32)

One config per invocation (tunnel compiles are minutes; the persistent
compile cache makes re-runs cheap):

  python benchmarks/scaling.py <batch> <highest|high|default|bf16>

Prints one JSON line. Results recorded in README.md's scaling table.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

K = 16
SUPERSTEPS = 20
N_CELEBA = 202599


def measure(batch, policy):
    from disvae_tpu.models.vae import init_specific_model
    from disvae_tpu.ops.losses import BtcvaeLoss, metric_key_order
    from disvae_tpu.ops.precision import configure
    from disvae_tpu.train.state import create_train_state
    from disvae_tpu.train.steps import (make_multi_train_step, make_optimizer,
                                        stack_metrics)

    configure("default" if policy == "bf16" else policy)
    # Final-convT backward A/B (benchmarks/convt3_bwd_ab.py): swap the
    # implementation for the whole step measurement. One impl per process.
    impl = os.environ.get("DISVAE_CONVT3", "xla")
    if impl != "xla":
        from disvae_tpu.models import burgess
        if impl == "pc":
            from disvae_tpu.ops.convs import conv2d_transpose_pc as fn
        elif impl == "pl":
            from disvae_tpu.ops.pallas_convt_bwd import (
                conv2d_transpose_pl as fn)
        else:
            raise ValueError("DISVAE_CONVT3 must be xla|pc|pl, got "
                             + impl)
        burgess.set_final_convt_impl(fn)
    compute_dtype = "bfloat16" if policy == "bf16" else "float32"
    model, params = init_specific_model("Burgess", (3, 64, 64), 10,
                                        key=jax.random.PRNGKey(0),
                                        compute_dtype=compute_dtype)
    loss_cfg = BtcvaeLoss(n_data=N_CELEBA, alpha=1.0, beta=6.0, gamma=1.0,
                          steps_anneal=0)
    optimizer = make_optimizer(5e-4)
    state = create_train_state(model, params, optimizer,
                               jax.random.PRNGKey(1), loss_cfg=loss_cfg)
    multi = make_multi_train_step(model, loss_cfg, optimizer)
    keys = metric_key_order(loss_cfg.name, model.latent_dim)

    rng = np.random.RandomState(0)
    batches = jax.device_put(
        rng.rand(K, batch, 64, 64, 3).astype(np.float32))

    def fetch(metrics):
        return np.asarray(stack_metrics(metrics, keys))

    print("# compiling b{} {}...".format(batch, policy), file=sys.stderr,
          flush=True)
    for _ in range(2):
        state, metrics = multi(state, batches)
    vals = fetch(metrics)
    assert np.isfinite(vals).all(), vals

    t0 = time.perf_counter()
    for _ in range(SUPERSTEPS):
        state, metrics = multi(state, batches)
    fetch(metrics)
    dt = time.perf_counter() - t0
    n_img = batch * K * SUPERSTEPS
    return {"batch": batch, "policy": policy, "convt3_impl": impl,
            "images_per_sec": round(n_img / dt, 1),
            "step_ms": round(1e3 * dt / (K * SUPERSTEPS), 3)}


if __name__ == "__main__":
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    p = sys.argv[2] if len(sys.argv) > 2 else "highest"
    print(json.dumps(measure(b, p)), flush=True)
