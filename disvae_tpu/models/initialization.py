"""Weight initializers matching the PyTorch reference's conventions.

The reference applies ``kaiming_uniform_(nonlinearity='relu')`` to EVERY conv /
linear weight via ``model.apply(weights_init)`` (reference:
disvae/utils/initialization.py:33-61, applied at disvae/models/vae.py:87-88 and
discriminator.py:72-73) — including layers followed by sigmoid or leaky-relu,
because ``weights_init`` never inspects the activation. Biases keep torch's
module-constructor default ``U(-1/sqrt(fan_in), 1/sqrt(fan_in))``.

Matching these *distributions* (not bitwise values — the RNG streams differ)
is what makes loss curves comparable at equal seeds.

Torch fan-in conventions replicated here:
  * Linear weight (out, in):              fan_in = in
  * Conv2d weight (out, in, kh, kw):      fan_in = in * kh * kw
  * ConvTranspose2d weight (in, out, kh, kw): fan_in = out * kh * kw
    (torch computes fan_in from ``tensor.size(1)`` which is the OUT channel
    count for transposed convs — a quirk we must reproduce.)
"""

import math

import jax
import jax.numpy as jnp


def kaiming_uniform(key, shape, fan_in, dtype=jnp.float32):
    """He-uniform with relu gain: U(-sqrt(6/fan_in), sqrt(6/fan_in))."""
    bound = math.sqrt(6.0 / fan_in)
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def torch_bias_uniform(key, shape, fan_in, dtype=jnp.float32):
    """Torch's default bias init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def init_linear(key, in_dim, out_dim, dtype=jnp.float32):
    """Linear layer params. Weight stored as (in, out) so apply is x @ W + b."""
    kw, kb = jax.random.split(key)
    return {
        "w": kaiming_uniform(kw, (in_dim, out_dim), fan_in=in_dim, dtype=dtype),
        "b": torch_bias_uniform(kb, (out_dim,), fan_in=in_dim, dtype=dtype),
    }


def init_conv(key, in_ch, out_ch, ksize, dtype=jnp.float32):
    """Strided conv params in HWIO layout (TPU-friendly NHWC convolution)."""
    kw, kb = jax.random.split(key)
    fan_in = in_ch * ksize * ksize
    return {
        "w": kaiming_uniform(kw, (ksize, ksize, in_ch, out_ch), fan_in=fan_in,
                             dtype=dtype),
        "b": torch_bias_uniform(kb, (out_ch,), fan_in=fan_in, dtype=dtype),
    }


def init_conv_transpose(key, in_ch, out_ch, ksize, dtype=jnp.float32):
    """Transposed-conv params, stored directly as the HWIO kernel of the
    equivalent input-dilated forward convolution (see ops/convs.py).

    Fan-in follows the torch ConvTranspose2d quirk: fan_in = out_ch * k * k.
    """
    kw, kb = jax.random.split(key)
    fan_in = out_ch * ksize * ksize
    return {
        "w": kaiming_uniform(kw, (ksize, ksize, in_ch, out_ch), fan_in=fan_in,
                             dtype=dtype),
        "b": torch_bias_uniform(kb, (out_ch,), fan_in=fan_in, dtype=dtype),
    }
