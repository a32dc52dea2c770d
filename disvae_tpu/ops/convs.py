"""NHWC convolution primitives for TPU.

The TPU MXU wants NHWC activations and HWIO kernels; these wrappers fix that
layout once so the model code stays free of dimension-number noise. The
reference's NCHW torch convs (disvae/models/encoders.py:69-77,
decoders.py:67-84) map here as: stride-2 k4 p1 conv halves H/W; its transpose
doubles H/W.

A transposed conv is expressed as an input-dilated forward conv — for kernel k,
stride s, padding p this is conv(dilate(x, s), kernel, padding=k-1-p) — which
lets XLA tile it on the MXU like any other conv instead of needing a separate
gradient-op lowering.
"""



import jax
import jax.numpy as jnp
from jax import lax

from disvae_tpu.ops.precision import fast_matmul_policy

_DN = ("NHWC", "HWIO", "NHWC")


def conv2d(x, w, b, stride=2, padding=1):
    """Strided NHWC conv. x: (N,H,W,Cin); w: (kh,kw,Cin,Cout); b: (Cout,)."""
    y = lax.conv_general_dilated(
        x, w,
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=_DN,
    )
    return y + b


def conv2d_transpose(x, w, b, stride=2, padding=1, ksize=4):
    """Transposed NHWC conv via input dilation.

    `w` is stored as the HWIO kernel of the equivalent forward conv (already
    spatially flipped relative to a torch ConvTranspose2d weight — see
    utils/torch_compat.py for the conversion). Output spatial size is
    ``stride * in_size`` for k=4, s=2, p=1.
    """
    pad = ksize - 1 - padding
    y = lax.conv_general_dilated(
        x, w,
        window_strides=(1, 1),
        padding=((pad, pad), (pad, pad)),
        lhs_dilation=(stride, stride),
        dimension_numbers=_DN,
    )
    return y + b


def conv2d_transpose_packed(x, w, b):
    """Polyphase (subpixel) formulation of conv2d_transpose for k=4, s=2,
    p=1 — the Burgess decoder's only transposed-conv shape.

    The input-dilated form (conv2d_transpose above) multiplies a 2x-dilated
    input: 3 of every 4 taps hit inserted zeros, and Cout=32 fills only a
    quarter of the 128-wide MXU. Decomposing by output phase (a, b) in
    {0,1}^2 instead: y[2i+a, 2j+b] uses only kernel taps with u ≡ a,
    v ≡ b (mod 2), so the whole op is ONE dense k=3, s=1 conv over the
    1-padded input with the four phases PACKED into 4*Cout=128 output
    channels, followed by a depth-to-space shuffle. Same math (tap-level
    identical, float reassociation only), 1.8x fewer MACs than the dilated
    form even if XLA does not skip zeros, and a full MXU N dimension.

    Derivation (1-D, forward-kernel taps Wf[0..3], output o = 2i + a):
      y[2i]   = x[i-1]*Wf[0] + x[i]*Wf[2]
      y[2i+1] = x[i]  *Wf[1] + x[i+1]*Wf[3]
    Both become windows of the same 1-padded X at k=3: phase 0 taps
    (Wf0, Wf2, 0), phase 1 taps (0, Wf1, Wf3).

    `w` is the same (4, 4, Cin, Cout) HWIO forward kernel conv2d_transpose
    takes; the (3, 3, Cin, 4*Cout) packed kernel is assembled from it at
    trace time (a few thousand elements — XLA folds it when params are
    constant and fuses it otherwise).
    """
    cin, cout = w.shape[2], w.shape[3]
    k3 = jnp.zeros((3, 3, cin, 4, cout), w.dtype)
    for a in (0, 1):
        for bph in (0, 1):
            for u in (0, 1, 2):
                tu = 2 * u - a
                if not 0 <= tu <= 3:
                    continue
                for v in (0, 1, 2):
                    tv = 2 * v - bph
                    if not 0 <= tv <= 3:
                        continue
                    k3 = k3.at[u, v, :, 2 * a + bph, :].set(w[tu, tv])
    k3 = k3.reshape(3, 3, cin, 4 * cout)

    n, h, wd, _ = x.shape
    y = lax.conv_general_dilated(
        x, k3,
        window_strides=(1, 1),
        padding=((1, 1), (1, 1)),  # left: x[i-1] at i=0; right: x[h] at i=h-1
        dimension_numbers=_DN,
    )  # (N, h, w, 4*Cout)
    # depth-to-space: channel (2a+b)*Cout+c -> pixel (2i+a, 2j+b, c)
    y = y.reshape(n, h, wd, 2, 2, cout)
    y = jnp.transpose(y, (0, 1, 3, 2, 4, 5)).reshape(n, 2 * h, 2 * wd, cout)
    return y + b


@jax.custom_vjp
def conv2d_transpose_mxu(x, w, b):
    """conv2d_transpose (k=4, s=2, p=1) with a hand-written XLA-op backward.

    MEASURED AND REJECTED for the decoder's final layer (kept, like
    conv2d_transpose_packed, as the correctness-tested record of the
    attempt). The e2e profiler trace showed XLA's weight-grad conv for the
    Cout<=3 final layer running at 4.5 TFLOP/s (177 us of the ~880 us b256
    `default` step) — a [K=B*H*W, N=Cout<=3] contraction wastes 125/128 MXU
    lanes — and this op reformulates the backward at the XLA-op level:

    - dx as the exact adjoint: the plain stride-2 forward conv of dy with
      the spatially flipped, I/O-swapped kernel.
    - dW packing the 16 kernel taps into one [Cin, R] x [R, 16*Cout]
      matmul (N grows 16x: 48 lanes for RGB vs 3).
    - db = sum(dy).

    On-chip verdict (benchmarks/convt3_bwd_ab.py + benchmarks/scaling.py,
    2026-08-17, b256 `default`): the full train step REGRESSED 0.95 ->
    1.855 ms. Two causes, both structural to XLA-level reformulation:
    (1) the packed tap tensor (16*Cout*B*H*W) must round-trip HBM — XLA's
    own fused backward shares the single dy read between dW and dx;
    (2) the explicit adjoint conv for dx has Cin=3, which starves the MXU's
    REDUCTION dim just as badly as N=3 starves its lanes (+380 us vs the
    45 us fusion XLA emits from autodiff, where dx fuses with the upstream
    relu mask). Beating fusion.455 requires VMEM-resident tap packing —
    i.e. a Pallas kernel — not an op-graph rewrite. See
    ops/pallas_kernels.py for that follow-up.

    Original design notes:

    - dx is the exact adjoint: the plain stride-2 forward conv of dy with
      the spatially flipped, I/O-swapped kernel (reduction K = 16*Cout,
      N = Cin — the shape XLA already handles well).
    - dW packs the 16 kernel taps into one contraction: each tap's dy
      factor is a (phase, +-1-shift) slice of dy (output stride 2 => dy
      splits into 4 polyphase images), so stacking the 16 tap-slices as
      channels turns the weight grad into ONE [Cin, R] x [R, 16*Cout]
      matmul — N grows 16x (48 lanes for RGB vs 3).
    - db = sum(dy) as usual.

    Summation ORDER differs from XLA's gradient conv (float reassociation
    only); under the `default` precision policy the contraction operands
    are cast to bf16 up front — the same single-bf16-pass XLA itself uses —
    so the packed tap tensor is materialized at half the bytes.

    Worth it only when Cout is small: the tap tensor is 16*Cout*R elements,
    so for the 32-channel decoder layers (already at ~46 TFLOP/s in XLA)
    the 512-wide materialization would cost more HBM traffic than it saves.
    """
    return conv2d_transpose(x, w, b)


def _ct_mxu_fwd(x, w, b):
    return conv2d_transpose(x, w, b), (x, w)


def _tap_shift(u):
    """Forward-kernel row u -> (polyphase index, spatial shift) of dy.

    dW[u] needs dy[2i+2-u]: u=0 -> even phase shifted +1, u=1 -> odd phase,
    u=2 -> even phase, u=3 -> odd phase shifted -1."""
    return u & 1, (+1 if u == 0 else (-1 if u == 3 else 0))


def _ct_mxu_bwd(res, dy):
    x, w = res
    db = jnp.sum(dy, axis=(0, 1, 2))

    # input grad: adjoint of the k4 s2 p1 transposed conv IS the k4 s2 p1
    # forward conv with the flipped, in/out-swapped kernel
    w_hat = jnp.transpose(w[::-1, ::-1], (0, 1, 3, 2))
    dx = lax.conv_general_dilated(
        dy, w_hat, window_strides=(2, 2), padding=((1, 1), (1, 1)),
        dimension_numbers=_DN).astype(x.dtype)

    # weight grad, phase-packed (see conv2d_transpose_mxu docstring)
    cdt = jnp.bfloat16 if fast_matmul_policy() else dy.dtype
    n, h2, w2, cout = dy.shape
    h, wd = h2 // 2, w2 // 2
    cin = x.shape[-1]
    phases = dy.astype(cdt).reshape(n, h, 2, wd, 2, cout)

    def tap(u, v):
        (a, su), (bp, sv) = _tap_shift(u), _tap_shift(v)
        img = phases[:, :, a, :, bp, :]
        if su:
            img = jnp.roll(img, -su, axis=1)
            img = img.at[:, 0 if su < 0 else h - 1].set(0)
        if sv:
            img = jnp.roll(img, -sv, axis=2)
            img = img.at[:, :, 0 if sv < 0 else wd - 1].set(0)
        return img

    taps = jnp.stack([tap(u, v) for u in range(4) for v in range(4)],
                     axis=3)                      # (N, h, w, 16, Cout)
    dw_flat = lax.dot_general(
        x.astype(cdt).reshape(-1, cin), taps.reshape(-1, 16 * cout),
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)       # (Cin, 16*Cout)
    dw = dw_flat.reshape(cin, 4, 4, cout).transpose(1, 2, 0, 3)
    return dx, dw.astype(w.dtype), db.astype(w.dtype)


conv2d_transpose_mxu.defvjp(_ct_mxu_fwd, _ct_mxu_bwd)


@jax.custom_vjp
def conv2d_transpose_pc(x, w, b):
    """conv2d_transpose (k=4, s=2, p=1) with a phase-conv weight gradient.

    Forward is bit-identical to conv2d_transpose. The backward targets the
    same MXU pathology as conv2d_transpose_mxu (XLA's weight-grad conv for
    the Cout<=3 final decoder layer runs at 4.5 TFLOP/s: N=Cout lanes,
    3/4 of the dilated-x window multiplying structural zeros) but stays
    entirely inside XLA's CONV machinery instead of hand-packing tap
    matrices (which round-tripped HBM in narrow-lane layouts — the measured
    failure of _mxu, see benchmarks/convt3_bwd_ab.py):

    - dx and db are the EXACT primitives jax's autodiff emits (same
      conv_general_dilated dimension numbers, paddings and strides — the
      I/O swap lives in rhs_spec, no materialized kernel transpose), so
      their compiled form and cost are identical to autodiff's.
    - dW: dy is space-to-depth'd ONCE into dyq (N, H+1, W+1, 4*Cout) —
      per spatial dim the even polyphase is zero-padded at the END and the
      odd one at the START, aligning every kernel tap to one of just TWO
      x-offsets. The weight grad is then a single batch-feature-swapped
      grad-conv with a 2x2 window over the UNDILATED x producing
      (2, 2, Cin, 4*Cout): zero wasted MACs and 4x the output lanes of the
      autodiff form. A static transpose/reshape of the 1.5K-element result
      recovers dW (4, 4, Cin, Cout).

    Derivation (1-D): the dilated-correlation forward gives
    y[2i+2-u] += x[i]*w[u], so dW[u] = sum_i x[i]*dy[2i+2-u]. With the
    length-(H+1) aligned phases dyq0[j] = dy[2j] and dyq1[j] = dy[2j-1]
    (out-of-range rows are the zero pads):
    u=0: sum_j x[j-1]*dyq0[j];  u=1: sum_j x[j-1]*dyq1[j];
    u=2: sum_j x[j]  *dyq0[j];  u=3: sum_j x[j]  *dyq1[j]
    i.e. x-offset = u>>1 (conv padding (1,1), window H+1, 2 output
    positions) and phase = u&1 — the (2,2,Ci,2,2,Co) grad-conv output
    indexes as dW[u,v] = dK[u>>1, v>>1, ci, u&1, v&1, co].
    """
    return conv2d_transpose(x, w, b)


def _ct_pc_fwd(x, w, b):
    return conv2d_transpose(x, w, b), (x, w)


def _ct_pc_bwd(res, dy):
    x, w = res
    db = jnp.sum(dy, axis=(0, 1, 2)).astype(w.dtype)

    # dx: jax's own transpose-conv input grad, verbatim (I/O swap via
    # dimension numbers; kernel only spatially reversed)
    dn_dx = lax.ConvDimensionNumbers(lhs_spec=(0, 3, 1, 2),
                                     rhs_spec=(2, 3, 0, 1),
                                     out_spec=(0, 3, 1, 2))
    dx = lax.conv_general_dilated(
        dy, w[::-1, ::-1], window_strides=(2, 2),
        padding=((1, 1), (1, 1)), dimension_numbers=dn_dx).astype(x.dtype)

    if not fast_matmul_policy():
        # parity policies (highest/high): emit the exact dW primitive
        # autodiff would — bit-identical results, identical compiled cost.
        # The phase-conv dW below reorders the summation (fine under the
        # fast policy, which is already reassociating into bf16 passes).
        dn_w = lax.ConvDimensionNumbers(lhs_spec=(3, 0, 1, 2),
                                        rhs_spec=(3, 0, 1, 2),
                                        out_spec=(2, 3, 0, 1))
        dw = lax.conv_general_dilated(
            x, dy, window_strides=(1, 1), padding=((2, 2), (2, 2)),
            lhs_dilation=(2, 2), dimension_numbers=dn_w)
        return dx, dw.astype(w.dtype), db

    dw = _phase_conv_dw(x, dy, jnp.bfloat16)
    return dx, dw.astype(w.dtype), db


def aligned_phase_s2d(dy, cdt):
    """Aligned polyphase (space-to-depth) decomposition of a stride-2
    output gradient: (N, 2H, 2W, C) -> (N, H+1, W+1, 4C) with
    out[n, i, j, (pi*2 + pj)*C + c] = dy[n, 2i - pi, 2j - pj, c] (zero out
    of range). Every k4s2p1 transposed-conv gradient tap aligns to one of
    two offsets of these phases — the shared substrate of the phase-conv
    backward (conv2d_transpose_pc) and the Pallas fused backward
    (ops/pallas_convt_bwd.py)."""
    n, h2, w2, cout = dy.shape
    h, wd = h2 // 2, w2 // 2
    ph = dy.astype(cdt).reshape(n, h, 2, wd, 2, cout)
    # aligned length-(h+1) phases: even padded at the end (dyq0[h] =
    # dy[2h] = 0), odd at the start (dyq1[0] = dy[-1] = 0)
    p0 = jnp.pad(ph[:, :, 0], ((0, 0), (0, 1), (0, 0), (0, 0), (0, 0)))
    p1 = jnp.pad(ph[:, :, 1], ((0, 0), (1, 0), (0, 0), (0, 0), (0, 0)))
    ph = jnp.stack([p0, p1], axis=2)          # (n, h+1, 2, wd, 2, cout)
    q0 = jnp.pad(ph[..., 0, :], ((0, 0), (0, 0), (0, 0), (0, 1), (0, 0)))
    q1 = jnp.pad(ph[..., 1, :], ((0, 0), (0, 0), (0, 0), (1, 0), (0, 0)))
    ph = jnp.stack([q0, q1], axis=4)          # (n, h+1, 2, wd+1, 2, cout)
    return ph.transpose(0, 1, 3, 2, 4, 5).reshape(n, h + 1, wd + 1,
                                                  4 * cout)


def _phase_conv_dw(x, dy, cdt):
    """dW of the k4 s2 p1 transposed conv via the phase-conv formulation
    (see conv2d_transpose_pc): one s2d+pad copy of dy, then a 2x2-window
    batch-feature-swapped conv over the undilated x. `cdt` is the
    contraction operand dtype (bf16 on the fast path; f32 in tests)."""
    cin = x.shape[-1]
    cout = dy.shape[-1]
    dyq = aligned_phase_s2d(dy, cdt)

    dn_dw = lax.ConvDimensionNumbers(lhs_spec=(3, 0, 1, 2),
                                     rhs_spec=(3, 0, 1, 2),
                                     out_spec=(2, 3, 0, 1))
    dk = lax.conv_general_dilated(
        x.astype(cdt), dyq, window_strides=(1, 1),
        padding=((1, 1), (1, 1)), dimension_numbers=dn_dw,
        preferred_element_type=jnp.float32)       # (2, 2, Cin, 4*Cout)
    return (dk.reshape(2, 2, cin, 2, 2, cout)
              .transpose(0, 3, 1, 4, 2, 5)        # (du, a, dv, b, ci, co)
              .reshape(4, 4, cin, cout))


conv2d_transpose_pc.defvjp(_ct_pc_fwd, _ct_pc_bwd)


def linear(x, p):
    """Dense layer; p = {'w': (in,out), 'b': (out,)}."""
    return x @ p["w"] + p["b"]
