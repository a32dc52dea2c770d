"""Pallas TPU kernels for the FINAL decoder convT's backward.

Why this layer: the on-chip profiler trace (artifacts/profile_probe,
2026-08-17) attributed ~334 us of the ~950 us b256 `default` train step to
the last transposed conv's backward (reference decoders.py:82-84 — the
32ch 32x32 -> n_chan<=3 64x64 layer). Both of XLA's gradient convs are
MXU-starved there: the weight grad has Cout<=3 output lanes (4.5 TFLOP/s
measured in isolation) and the input grad reduces over only Cout<=3
features. Op-graph rewrites could not beat the fused autodiff backward
(benchmarks/convt3_bwd_ab.py: the tap-pack variant round-trips HBM and
lost 2.1x), so this module takes the remaining route the A/B verdict
pointed at: VMEM-resident packing.

Formulation (see `aligned_phase_s2d` in ops/convs.py): with the aligned
polyphase decomposition Q[n, i, j, (pi, pj, co)] = dy[n, 2i-pi, 2j-pj, co]
(zero out of range), every gradient of the k4 s2 p1 transposed conv
y[n, 2i+2-u, 2j+2-v, co] += x[n, i, j, ci] w[u, v, ci, co] becomes a
dense, zero-waste matmul:

  dW[u, v, ci, co] = sum_{n,i,j} x[n, i+du-1, j+dv-1, ci] Q[n, i, j, pi pj co]
      with (du, pi) = (u >> 1, u & 1) — four accumulating
      (M, Cin) x (M, 4*Cout) dot_generals, one per (du, dv) shift of x,
      each writing its own Cin-row block of the (4*Cin, 4*Cout)
      accumulator, instead of autodiff's Cout-lane-starved grad-conv.
      (The ideal single (M, 4*Cin) x (M, 4*Cout) contraction — whose LHS
      would pack the four shifts into exactly 128 rows at Cin=32, the
      MXU's native height — is not expressible: Mosaic cannot
      lane-concatenate spatially-shifted slices, "result/input offset
      mismatch on non-concat dimension", observed on chip 2026-08-18.)
  dx[n, i, j, ci] = sum Q[n, i+1-du, j+1-dv, (pi, pj, co)] w[u, v, ci, co]
      — four (M, 4*Cout) x (4*Cout, Cin) dot_generals for the same
      Mosaic reason (reduction 12 per shift, 48 total, vs autodiff's
      3-feature reduction).

Both kernels stream batch-blocks of x / Q through VMEM (Pallas's
double-buffered pipeline); Q is materialized ONCE by a thin XLA prologue
(`dy` read + 0.65x write) and shared by both kernels, and the only HBM
traffic is the operands themselves (~42 MB per kernel at b256 celeba vs
autodiff's repeated dilated-x round trips); the shift slices relayout in
VMEM, never HBM. The contractions run in bf16 with f32 accumulation —
the same pass structure XLA's DEFAULT precision uses, so this path is
only wired under the fast numeric policy (parity policies keep the exact
autodiff primitives, as in conv2d_transpose_pc).

`conv2d_transpose_pl` is the custom_vjp wrapper; forward is bit-identical
to conv2d_transpose. Exactness is gated on the CPU interpreter
(tests/test_models.py); adoption into the decoder is an on-chip A/B
decision recorded in benchmarks/convt3_bwd_ab.py.
"""

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from disvae_tpu.ops.convs import (_ct_pc_bwd, aligned_phase_s2d,
                                  conv2d_transpose)
from disvae_tpu.ops.precision import fast_matmul_policy

# Batch rows per grid step. At BN=4, Cin=32, H=W=32, Cout=3 (celeba) the
# dominant dW-kernel blocks are the pre-padded xp (BN, H+2, Jq+1, Cin)
# ~= 213k elements and Q (BN, H+1, Jq, 4*Cout) ~= 76k elements per
# buffer; with double buffering, f32 inputs, and the in-kernel bf16
# copies that is ~3-4 MB per step — comfortably inside the ~16 MB core.
_BN = 4


def _dw_kernel(cdt, xpr, qr, out, acc):
    # Mosaic cannot concatenate spatially-shifted slices along the lane
    # dim ("result/input offset mismatch on non-concat dimension"), so
    # instead of packing the four (du, dv) shifts of x into one
    # (M, 4*Cin) LHS we run four accumulating dot_generals, each writing
    # its own Cin-row block of the (4*Cin, 4*Cout) accumulator. Same
    # contraction, same f32 accumulation, no lane-concat.
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    q = qr[:].astype(cdt)                 # (BN, H+1, Jq, 4*Cout)
    bn, hq, jq = q.shape[0], q.shape[1], q.shape[2]
    m = bn * hq * jq
    rhs = q.reshape(m, q.shape[-1])
    # xp: x pre-padded by the XLA prologue so that
    # xp[:, du:du+H+1, dv:dv+Jq, :] == x[i + du - 1, j + dv - 1] aligned
    # against Q[i, j] (zeros out of range / in Q's j-padding region).
    xp = xpr[:]                           # (BN, H+2, Jq+1, Cin)
    cin = xp.shape[-1]
    for du in (0, 1):
        for dv in (0, 1):
            xs = xp[:, du:du + hq, dv:dv + jq, :].astype(cdt)
            lhs = xs.reshape(m, cin)
            blk = lax.dot_general(
                lhs, rhs, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)     # (Cin, 4Cout)
            idx = du * 2 + dv
            acc[idx * cin:(idx + 1) * cin, :] += blk

    @pl.when(b == pl.num_programs(0) - 1)
    def _():
        out[:] = acc[:]


def _dx_kernel(cdt, qr, wr, out):
    # Concat-free for the same Mosaic reason as _dw_kernel: dx[i, j]
    # needs Q at rows i + 1 - du, cols j + 1 - dv (du, dv in 0..1), so
    # sum four (M, 4*Cout) x (4*Cout, Cin) dot_generals — one per
    # (du, dv) shift against its weight block — in f32.
    q = qr[:].astype(cdt)                 # (BN, H+1, Jq, 4*Cout)
    w2 = wr[:].astype(cdt)                # (4, 4*Cout, Cin)
    bn, h = q.shape[0], q.shape[1] - 1
    wd = out.shape[2]
    m = bn * h * wd
    dx = None
    for du in (0, 1):
        for dv in (0, 1):
            qs = q[:, 1 - du:1 - du + h, 1 - dv:1 - dv + wd, :]
            part = lax.dot_general(
                qs.reshape(m, qs.shape[-1]), w2[du * 2 + dv],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)     # (M, Cin)
            dx = part if dx is None else dx + part
    out[:] = dx.reshape(out.shape)


def _block_batch(n):
    for bn in (_BN, 2, 1):
        if n % bn == 0:
            return bn
    return 1


@functools.partial(jax.jit, static_argnames=("interpret", "cdt"))
def convt3_bwd_pl(x, w, dy, interpret=False, cdt=jnp.bfloat16):
    """(dx, dw, db) of conv2d_transpose (k=4, s=2, p=1) via the fused
    Pallas kernels. `cdt` contraction operands (bf16 on the fast path;
    f32 for exactness tests), f32 accumulation."""
    n, h, wd, cin = x.shape
    cout = dy.shape[-1]
    bn = _block_batch(n)
    # j padded to a bf16 sublane-tile multiple (16) so the in-kernel
    # row-merge reshape (BN, H+1, Jq, L) -> (BN*(H+1)*Jq, L) stays
    # tile-aligned for both contraction dtypes
    jq = wd + 1 + (-(wd + 1)) % 16

    q = aligned_phase_s2d(dy, cdt)                      # (N, H+1, W+1, 4Co)
    q = jnp.pad(q, ((0, 0), (0, 0), (0, jq - (wd + 1)), (0, 0)))
    # x[i + du - 1, j + dv - 1] aligned against Q[i, j]: pad by 1 on the
    # leading edges (the du/dv = 0 taps) and by (Jq - W) on the trailing
    # j edge (Q's j-padding region multiplies zeros there). Done here in
    # XLA (fused into the epilogue of whatever produced x).
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, jq - wd), (0, 0)))

    dk = pl.pallas_call(
        functools.partial(_dw_kernel, cdt),
        grid=(n // bn,),
        in_specs=[
            pl.BlockSpec((bn, h + 2, jq + 1, cin), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, h + 1, jq, 4 * cout), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((4 * cin, 4 * cout), lambda b: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4 * cin, 4 * cout), jnp.float32),
        scratch_shapes=[pltpu.VMEM((4 * cin, 4 * cout), jnp.float32)],
        interpret=interpret,
    )(xp, q)
    # rows (du, dv, ci), cols (pi, pj, co) -> w[2du+pi, 2dv+pj, ci, co]
    dw = (dk.reshape(2, 2, cin, 2, 2, cout)
            .transpose(0, 3, 1, 4, 2, 5)
            .reshape(4, 4, cin, cout)).astype(w.dtype)

    # W2[(du, dv), (pi, pj, co), ci] = w[2du+pi, 2dv+pj, ci, co]
    w2 = (w.reshape(2, 2, 2, 2, cin, cout)      # (du, pi, dv, pj, ci, co)
           .transpose(0, 2, 1, 3, 5, 4)
           .reshape(4, 4 * cout, cin))
    dx = pl.pallas_call(
        functools.partial(_dx_kernel, cdt),
        grid=(n // bn,),
        in_specs=[
            pl.BlockSpec((bn, h + 1, jq, 4 * cout), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, 4 * cout, cin), lambda b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bn, h, wd, cin), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, wd, cin), jnp.float32),
        interpret=interpret,
    )(q, w2).astype(x.dtype)

    db = jnp.sum(dy, axis=(0, 1, 2)).astype(w.dtype)
    return dx, dw, db


# None = auto (interpret unless the backend is a real TPU — no Mosaic
# compiler elsewhere); tests may pin True/False explicitly.
_INTERPRET = None


def _interpret_mode():
    if _INTERPRET is not None:
        return _INTERPRET
    # device_kind, not default_backend(): the tunneled chip registers as
    # platform "axon" but its device_kind is still "TPU v5 lite".
    d = jax.devices()[0]
    return "tpu" not in (d.device_kind + " " + d.platform).lower()


@jax.custom_vjp
def conv2d_transpose_pl(x, w, b):
    """conv2d_transpose (k=4, s=2, p=1) with the fused Pallas backward
    (module docstring). Forward bit-identical to conv2d_transpose; under
    parity numeric policies the backward falls back to the exact autodiff
    primitives (the Pallas path is a bf16-contraction formulation, only
    meaningful under the fast policy)."""
    return conv2d_transpose(x, w, b)


def _ct_pl_fwd(x, w, b):
    return conv2d_transpose(x, w, b), (x, w)


def _ct_pl_bwd(res, dy):
    x, w = res
    if not fast_matmul_policy():
        # exact autodiff primitives: delegate to conv2d_transpose_pc's
        # parity branch (ONE definition of the bit-identical dimension
        # numbers), which takes this same branch under parity policies.
        return _ct_pc_bwd(res, dy)
    return convt3_bwd_pl(x, w, dy, interpret=_interpret_mode())


conv2d_transpose_pl.defvjp(_ct_pl_fwd, _ct_pl_bwd)
