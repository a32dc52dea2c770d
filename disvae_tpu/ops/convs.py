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


def linear(x, p):
    """Dense layer; p = {'w': (in,out), 'b': (out,)}."""
    return x @ p["w"] + p["b"]
