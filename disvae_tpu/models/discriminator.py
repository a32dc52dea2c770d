"""FactorVAE total-correlation discriminator (Kim & Mnih 2018, Alg. 2).

Parity with reference disvae/models/discriminator.py:10-73: a 6-layer MLP,
1000 hidden units, LeakyReLU(0.2), emitting 2 logits (softmax formulation
rather than 1 logit + sigmoid). All weights get the same kaiming-uniform relu
init the reference applies blindly via weights_init.

The 1000-unit hidden layers are the only matmuls in the whole framework big
enough to shard: `parallel/mesh.py` can split them over a 'model' mesh axis.
"""

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from disvae_tpu.models.initialization import init_linear
from disvae_tpu.ops.convs import linear

N_LAYERS = 6


@dataclass(frozen=True)
class Discriminator:
    latent_dim: int = 10
    hidden_units: int = 1000
    neg_slope: float = 0.2
    out_units: int = 2

    def init(self, key, dtype=jnp.float32):
        keys = jax.random.split(key, N_LAYERS)
        dims = ([self.latent_dim] + [self.hidden_units] * (N_LAYERS - 1)
                + [self.out_units])
        return {"lin{}".format(i + 1): init_linear(keys[i], dims[i], dims[i + 1],
                                                   dtype)
                for i in range(N_LAYERS)}

    def apply(self, params, z):
        h = z
        for i in range(1, N_LAYERS):
            h = jax.nn.leaky_relu(linear(h, params["lin{}".format(i)]),
                                  self.neg_slope)
        return linear(h, params["lin{}".format(N_LAYERS)])
