"""A/B: transposed-conv formulations on the real chip (VERDICT r1 item 6).

The Burgess decoder's convT (k4 s2 p1, 32ch) is the conv-FLOPs hot spot.
Two exact formulations are compared at the btcvae_celeba b256 workload:

  dilated  — input-dilated forward conv (ops/convs.py conv2d_transpose):
             3 of 4 taps multiply inserted zeros, Cout=32 fills 1/4 of the
             128-wide MXU.
  packed   — polyphase/subpixel decomposition (conv2d_transpose_packed):
             one dense k3 s1 conv with the 4 output phases packed into
             4*Cout=128 channels + depth-to-space. 1.8x fewer MACs and a
             full MXU N dimension; tap-level identical math.

Run: `python benchmarks/conv_ab.py [dilated|packed]` (single chip; tunnel
compiles are minutes per program — run one variant per invocation with
JAX_COMPILATION_CACHE_DIR set). Prints incremental `# key = value` lines
plus one JSON line, synced by real device->host fetches
(block_until_ready is not a reliable barrier on this platform).

MEASURED (2026-08-16, 1x TPU v5e via axon, f32 highest, b256,
single-dispatch timing — includes per-dispatch tunnel latency, identical
for both variants; the production path amortizes it with a K-step scan):

    metric                      dilated     packed
    full btcvae train step      7.855 ms    16.305 ms   <- decision metric
    decoder forward             2.86-3.20   2.687 ms
    decoder grad (input+kernel) 3.301 ms    3.762 ms
    decoder forward bf16        —           2.138 ms

VERDICT: the packed form wins ~6-16% on the pure forward (full-MXU N dim,
no zero MACs) but loses the FULL TRAIN STEP by 2.1x: autodiff through the
k3 kernel-assembly scatters and the depth-to-space shuffle produces a far
worse backward than XLA's native transposed-conv gradient, and at this
model size the step is dispatch/HBM-bound rather than MXU-utilization
bound. The dilated form stays the default; conv2d_transpose_packed is kept
as the measured, correctness-tested reference of the attempt (it may win
for derived models with wide channels where the forward dominates). This
refutes the r1 README conjecture of "3-5x conv headroom" — the measured
headroom on the train step is negative.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = 256
REPS = 20


def _time(fn, *args):
    out = fn(*args)  # compile
    _ = np.asarray(jnp.ravel(out[0] if isinstance(out, tuple) else out)[:8])
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    _ = np.asarray(jnp.ravel(out[0] if isinstance(out, tuple) else out)[:8])
    return (time.perf_counter() - t0) / REPS * 1e3  # ms


def main():
    from disvae_tpu.ops.precision import configure
    configure("highest")  # the CLI's default (parity) path — A/B both there
    from disvae_tpu.models import burgess
    from disvae_tpu.models.vae import init_specific_model
    from disvae_tpu.ops.convs import conv2d_transpose, conv2d_transpose_packed
    from disvae_tpu.ops.losses import BtcvaeLoss
    from disvae_tpu.train.state import create_train_state
    from disvae_tpu.train.steps import make_optimizer, make_train_step

    results = {}

    def record(key, value):
        results[key] = value
        print("#", key, "=", value, flush=True)  # partial results survive

    rng = np.random.RandomState(0)
    z = jax.device_put(rng.randn(BATCH, 10).astype(np.float32))
    batch = jax.device_put(rng.rand(BATCH, 64, 64, 3).astype(np.float32))

    model, params = init_specific_model("Burgess", (3, 64, 64), 10,
                                        key=jax.random.PRNGKey(0))
    dec_params = jax.device_put(params["decoder"])

    variants = [("dilated", conv2d_transpose),
                ("packed", conv2d_transpose_packed)]
    if len(sys.argv) > 1:  # run a single variant (compiles are ~2 min each)
        variants = [v for v in variants if v[0] == sys.argv[1]]
    for name, impl in variants:
        burgess.conv2d_transpose = impl

        # full btcvae train step FIRST — the decision metric (tunnel
        # compiles are minutes; partial output must carry it)
        loss_cfg = BtcvaeLoss(n_data=202599, alpha=1.0, beta=6.0, gamma=1.0,
                              steps_anneal=0)
        opt = make_optimizer(5e-4)
        state = create_train_state(model, params, opt, jax.random.PRNGKey(1))
        step = make_train_step(model, loss_cfg, opt, donate=False)

        def one(s):
            s2, m = step(s, batch)
            return m["loss"] * 0 + m["recon_loss"]  # tiny fetch dependency
        ms = _time(lambda s: jnp.stack([one(s)]), state)
        record("train_step_ms_" + name, round(ms, 3))
        record("train_ips_" + name, round(BATCH / (ms / 1e3), 1))

        dec_fwd = jax.jit(lambda p, zz: burgess.apply_decoder(p, zz))
        record("decoder_fwd_ms_" + name, round(_time(dec_fwd, dec_params, z), 3))

        def dec_loss(p, zz):
            return jnp.sum(burgess.apply_decoder(p, zz) ** 2)
        dec_grad = jax.jit(jax.grad(dec_loss))
        record("decoder_grad_ms_" + name, round(
            _time(lambda p, zz: dec_grad(p, zz)["convT1"]["w"], dec_params,
                  z), 3))

        # bf16 decoder forward (speed-of-light probe; parity path stays f32)
        dec_fwd16 = jax.jit(lambda p, zz: burgess.apply_decoder(
            p, zz, compute_dtype=jnp.bfloat16))
        record("decoder_fwd_ms_" + name + "_bf16", round(
            _time(dec_fwd16, dec_params, z), 3))

    burgess.conv2d_transpose = conv2d_transpose
    print(json.dumps(results))


if __name__ == "__main__":
    main()
