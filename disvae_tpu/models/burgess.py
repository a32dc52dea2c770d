"""Burgess et al. (2018) convolutional encoder/decoder as init/apply pairs.

Architecture parity with the reference (disvae/models/encoders.py:16-89,
decoders.py:16-84): 3 (or 4 for 64x64) stride-2 k4 convs with 32 channels and
ReLU, two 256-unit FC layers, a 2*latent_dim head split into (mu, logvar); the
decoder mirrors it with a final sigmoid. Re-designed TPU-first: NHWC layout,
HWIO kernels, static shapes per image size (the 32/64 branch is resolved at
trace time from the static img_size, never from traced data), pure functions
of a params pytree.
"""

import jax
import jax.numpy as jnp

from disvae_tpu.models.initialization import (init_conv, init_conv_transpose,
                                              init_linear)
from disvae_tpu.ops.convs import conv2d, conv2d_transpose, linear

HID_CHANNELS = 32
KERNEL = 4
HIDDEN_DIM = 256
# Spatial size after the conv stack (both 32^2 and 64^2 funnel down to 4x4).
BOTTLENECK_HW = 4
BOTTLENECK_FLAT = HID_CHANNELS * BOTTLENECK_HW * BOTTLENECK_HW  # 512


def _is_64(img_size):
    if list(img_size[1:]) not in ([32, 32], [64, 64]):
        raise RuntimeError(
            "{} sized images not supported. Only (None, 32, 32) and "
            "(None, 64, 64) supported. Build your own architecture or "
            "reshape images!".format(img_size))
    return img_size[1] == img_size[2] == 64


def init_encoder(key, img_size, latent_dim, dtype=jnp.float32):
    """Parameters for the Burgess encoder. img_size is (C, H, W) as in the
    reference's metadata convention (channels first in *metadata only*)."""
    is_64 = _is_64(img_size)
    n_chan = img_size[0]
    keys = jax.random.split(key, 7)
    params = {
        "conv1": init_conv(keys[0], n_chan, HID_CHANNELS, KERNEL, dtype),
        "conv2": init_conv(keys[1], HID_CHANNELS, HID_CHANNELS, KERNEL, dtype),
        "conv3": init_conv(keys[2], HID_CHANNELS, HID_CHANNELS, KERNEL, dtype),
        "lin1": init_linear(keys[4], BOTTLENECK_FLAT, HIDDEN_DIM, dtype),
        "lin2": init_linear(keys[5], HIDDEN_DIM, HIDDEN_DIM, dtype),
        "mu_logvar_gen": init_linear(keys[6], HIDDEN_DIM, latent_dim * 2, dtype),
    }
    if is_64:
        params["conv_64"] = init_conv(keys[3], HID_CHANNELS, HID_CHANNELS,
                                      KERNEL, dtype)
    return params


def _cast_tree(params, dtype):
    if dtype is None:
        return params
    return jax.tree_util.tree_map(lambda a: a.astype(dtype), params)


def apply_encoder(params, x, latent_dim, compute_dtype=None):
    """Encode a batch. x: (N, H, W, C) in [0, 1]. Returns (mu, logvar) in
    float32. With compute_dtype=bfloat16 the whole stack INCLUDING the
    mu/logvar head runs with bf16 activations and weights; only the head's
    OUTPUT (and everything downstream: reparam, losses) is cast back to f32.
    Measured neutral on v5e at b256-b1024 (the 32-channel convs underfill
    the 128-wide MXU either way) — provided for larger derived models, not
    as a default."""
    params = _cast_tree(params, compute_dtype)
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
    h = jax.nn.relu(conv2d(x, params["conv1"]["w"], params["conv1"]["b"]))
    h = jax.nn.relu(conv2d(h, params["conv2"]["w"], params["conv2"]["b"]))
    h = jax.nn.relu(conv2d(h, params["conv3"]["w"], params["conv3"]["b"]))
    if "conv_64" in params:
        h = jax.nn.relu(conv2d(h, params["conv_64"]["w"], params["conv_64"]["b"]))
    # Flatten in the torch (N, C, H, W) element order so converted checkpoints
    # feed lin1 identically: NHWC -> NCHW -> flat.
    h = jnp.transpose(h, (0, 3, 1, 2)).reshape(h.shape[0], -1)
    h = jax.nn.relu(linear(h, params["lin1"]))
    h = jax.nn.relu(linear(h, params["lin2"]))
    mu_logvar = linear(h, params["mu_logvar_gen"]).astype(jnp.float32)
    # Interleaved (mu, logvar) pairs, split as in the reference's
    # view(-1, latent_dim, 2).unbind(-1) (encoders.py:86-88).
    mu_logvar = mu_logvar.reshape(-1, latent_dim, 2)
    return mu_logvar[..., 0], mu_logvar[..., 1]


def init_decoder(key, img_size, latent_dim, dtype=jnp.float32):
    """Parameters for the Burgess decoder (mirror of the encoder)."""
    is_64 = _is_64(img_size)
    n_chan = img_size[0]
    keys = jax.random.split(key, 7)
    params = {
        "lin1": init_linear(keys[0], latent_dim, HIDDEN_DIM, dtype),
        "lin2": init_linear(keys[1], HIDDEN_DIM, HIDDEN_DIM, dtype),
        "lin3": init_linear(keys[2], HIDDEN_DIM, BOTTLENECK_FLAT, dtype),
        "convT1": init_conv_transpose(keys[4], HID_CHANNELS, HID_CHANNELS,
                                      KERNEL, dtype),
        "convT2": init_conv_transpose(keys[5], HID_CHANNELS, HID_CHANNELS,
                                      KERNEL, dtype),
        "convT3": init_conv_transpose(keys[6], HID_CHANNELS, n_chan, KERNEL,
                                      dtype),
    }
    if is_64:
        params["convT_64"] = init_conv_transpose(keys[3], HID_CHANNELS,
                                                 HID_CHANNELS, KERNEL, dtype)
    return params


# Implementation hook for the FINAL transposed conv only (Cout = n_chan
# <= 3 — the step's worst MXU-starved backward; see
# benchmarks/convt3_bwd_ab.py). Forward output is bit-identical across
# implementations and parity policies keep autodiff's exact backward, so
# swapping is a pure fast-policy-throughput decision. Swap BEFORE tracing
# (jit caches the traced callee); one implementation per process.
_convT_final = conv2d_transpose


def set_final_convt_impl(fn):
    """A/B hook: replace the final decoder convT implementation (e.g. with
    ops.pallas_convt_bwd.conv2d_transpose_pl). Call before any jit trace."""
    global _convT_final
    _convT_final = fn


def apply_decoder(params, z, compute_dtype=None):
    """Decode latents. z: (N, latent_dim). Returns (N, H, W, C) in (0, 1),
    float32 (the sigmoid and the reconstruction loss stay full precision)."""
    params = _cast_tree(params, compute_dtype)
    if compute_dtype is not None:
        z = z.astype(compute_dtype)
    h = jax.nn.relu(linear(z, params["lin1"]))
    h = jax.nn.relu(linear(h, params["lin2"]))
    h = jax.nn.relu(linear(h, params["lin3"]))
    # Un-flatten in torch element order: flat -> (N, C, 4, 4) -> NHWC.
    h = h.reshape(-1, HID_CHANNELS, BOTTLENECK_HW, BOTTLENECK_HW)
    h = jnp.transpose(h, (0, 2, 3, 1))
    if "convT_64" in params:
        h = jax.nn.relu(conv2d_transpose(h, params["convT_64"]["w"],
                                         params["convT_64"]["b"]))
    h = jax.nn.relu(conv2d_transpose(h, params["convT1"]["w"],
                                     params["convT1"]["b"]))
    h = jax.nn.relu(conv2d_transpose(h, params["convT2"]["w"],
                                     params["convT2"]["b"]))
    h = jax.nn.sigmoid(_convT_final(h, params["convT3"]["w"],
                                    params["convT3"]["b"])
                       .astype(jnp.float32))
    return h
