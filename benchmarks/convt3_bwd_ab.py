"""A/B: final-decoder-convT backward formulations on the real chip.

The e2e profiler trace (artifacts/profile_probe, 2026-08-17) showed the
FINAL decoder convT's backward costing 334 us of the ~880 us b256 `default`
train step: XLA's weight-grad conv runs at 4.5 TFLOP/s (N=Cout<=3 wastes
125/128 MXU lanes) and its input-grad conv at 157 us. conv2d_transpose_mxu
(ops/convs.py) replaces both via custom_vjp — but the full-step measurement
regressed 0.95 -> 1.855 ms, so this bench isolates WHERE the time goes.

Variants (all at the decoder-final shape: b256, 32x32x32 -> 64x64x3, f32
activations, `default` numeric policy — the headline path):

  xla_full   - d(x,w,b) by autodiff through conv2d_transpose (baseline)
  pl_full    - d(x,w,b) through conv2d_transpose_pl: fused Pallas dW+dx
               kernels (ops/pallas_convt_bwd.py); pl_bwd_all isolates the
               backward itself
  pc_full    - d(x,w,b) through conv2d_transpose_pc: phase-conv dW,
               autodiff-identical dx (ops/convs.py); pc_dw isolates dW
  mxu_full   - d(x,w,b) through conv2d_transpose_mxu's hand-written vjp
  xla_dw     - dW alone via autodiff
  mxu_dw     - dW alone via the polyphase tap-pack + single dot_general
  xla_dx     - dx alone via autodiff (XLA's gradient conv)
  mxu_dx     - dx alone via the explicit stride-2 adjoint conv

MEASURED 2026-08-18 (relay restored; same chip, fresh floor — compare
deltas within a run, not across runs):

    xla_full_ms = 0.980   (baseline, fused autodiff backward)
    pl_full_ms  = 5.600   pl_bwd_all_ms = 2.609
    pc_full_ms  = 1.143   pc_dw_ms      = 0.890
    mxu_full_ms = 0.972   (within noise of baseline this run)

First pl attempt failed Mosaic compilation outright (lane-concat of
spatially-shifted slices: "result/input offset mismatch on non-concat
dimension"); the concat-free rewrite (four accumulating dot_generals per
kernel) compiles but loses 5.7x — the per-shift VMEM relayouts and the
bn=4 grid swamp the MXU win. VERDICT: pl and pc both REJECTED; the
decoder keeps plain conv2d_transpose + XLA's fused autodiff backward.
Three formulations have now been measured against it (op-graph tap-pack,
phase-conv dW, VMEM-resident Pallas) and all lost; the 334 us fused
backward stands as the practical floor at this shape on this chip.

Run: `python benchmarks/convt3_bwd_ab.py` (single chip, one process; small
programs, compiles are seconds each). Prints `# key = value` lines plus one
JSON line; synced by >=1-d fetches.

MEASURED (2026-08-17, 1x TPU v5e via axon; times include a ~1.15 ms
per-dispatch tunnel floor — identical across variants, so DELTAS are the
device-time signal):

    mxu_full_ms    = 1.977     xla_full_ms = 1.400   (custom +577 us)
    mxu_dx_ms      = 1.535     xla_dx_ms   = 1.155   (custom dx +380 us:
                               a Cin=3 conv starves the MXU reduction dim)
    mxu_bwd_all_ms = 2.251     (tap pack round-trips HBM; XLA's fused
                               backward shares one dy read between dW+dx)
    xla_dw_ms      = 3.873     (!! XLA's dW ALONE is catastrophic too —
                               the 177 us figure only exists inside the
                               fused full backward)

VERDICT: conv2d_transpose_mxu REJECTED for production (decoder reverted to
plain conv2d_transpose + XLA autodiff); full-step check: scaling.py b256
`default` regressed 270,285 -> 138,030 img/s with it. The 177 us fusion.455
can only be beaten by VMEM-resident tap packing (Pallas), not an op-graph
rewrite.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

REPS = 50
_DN = ("NHWC", "HWIO", "NHWC")


def _time(fn, *args):
    out = fn(*args)  # compile + first-execution
    _ = np.asarray(jnp.ravel(jax.tree_util.tree_leaves(out)[0])[:8])
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    _ = np.asarray(jnp.ravel(jax.tree_util.tree_leaves(out)[0])[:8])
    return (time.perf_counter() - t0) / REPS * 1e3  # ms


def main():
    from disvae_tpu.ops.convs import (_ct_mxu_bwd, _ct_pc_bwd,
                                      conv2d_transpose, conv2d_transpose_mxu,
                                      conv2d_transpose_pc)
    from disvae_tpu.ops.precision import configure
    configure("default")

    results = {}

    def record(key, value):
        results[key] = value
        print("#", key, "=", value, flush=True)

    def progress(msg):
        print("# ..." + msg, file=sys.stderr, flush=True)

    rng = np.random.RandomState(0)
    progress("uploading operands")
    x = jax.device_put(rng.randn(256, 32, 32, 32).astype(np.float32))
    w = jax.device_put(rng.randn(4, 4, 32, 3).astype(np.float32))
    b = jax.device_put(rng.randn(3).astype(np.float32))
    t = jax.device_put(rng.randn(256, 64, 64, 3).astype(np.float32))
    _ = np.asarray(b)  # force the uploads through before any compile
    progress("operands resident")

    def full(op):
        def loss(x, w, b):
            return jnp.sum(op(x, w, b) * t)
        return jax.jit(jax.grad(loss, argnums=(0, 1, 2)))

    # Baseline FIRST (known-good program family, warm in the compile
    # cache): if even this stalls, the tunnel is sick and the run tells us
    # nothing about the pc variant.
    record("xla_full_ms", round(_time(full(conv2d_transpose), x, w, b), 4))
    # pl (fused Pallas dW+dx, ops/pallas_convt_bwd.py) and pc (phase-conv
    # dW, autodiff-identical dx) vs the XLA baseline are the decision
    # pairs.
    from disvae_tpu.ops.pallas_convt_bwd import (conv2d_transpose_pl,
                                                 convt3_bwd_pl)
    record("pl_full_ms", round(_time(full(conv2d_transpose_pl), x, w, b), 4))
    bwd_pl = jax.jit(lambda xx, ww, dy: convt3_bwd_pl(xx, ww, dy))
    record("pl_bwd_all_ms", round(_time(bwd_pl, x, w, t), 4))
    record("pc_full_ms", round(_time(full(conv2d_transpose_pc), x, w, b), 4))
    bwd_pc = jax.jit(lambda xx, ww, dy: _ct_pc_bwd((xx, ww), dy)[1])
    record("pc_dw_ms", round(_time(bwd_pc, x, w, t), 4))
    record("mxu_full_ms", round(_time(full(conv2d_transpose_mxu), x, w, b), 4))

    def grad_wrt(op, argnum):
        def loss(x, w, b):
            return jnp.sum(op(x, w, b) * t)
        return jax.jit(jax.grad(loss, argnums=argnum))

    record("xla_dw_ms", round(_time(grad_wrt(conv2d_transpose, 1), x, w, b), 4))
    record("xla_dx_ms", round(_time(grad_wrt(conv2d_transpose, 0), x, w, b), 4))

    # the custom pieces, isolated (dy = t, as in the full-grad case)
    bwd = jax.jit(lambda xx, ww, dy: _ct_mxu_bwd((xx, ww), dy))
    record("mxu_bwd_all_ms", round(_time(bwd, x, w, t), 4))

    def mxu_dx(dy, ww):
        w_hat = jnp.transpose(ww[::-1, ::-1], (0, 1, 3, 2))
        return lax.conv_general_dilated(
            dy, w_hat, window_strides=(2, 2), padding=((1, 1), (1, 1)),
            dimension_numbers=_DN)
    record("mxu_dx_ms", round(_time(jax.jit(mxu_dx), t, w), 4))

    print(json.dumps(results))


if __name__ == "__main__":
    main()
