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


def linear(x, p):
    """Dense layer; p = {'w': (in,out), 'b': (out,)}."""
    return x @ p["w"] + p["b"]
