"""Gaussian log-density helpers and the MSS importance-weight matrix.

TPU-native counterparts of reference disvae/utils/math.py:8-73. These are pure
jnp functions; under jit XLA fuses them into the surrounding loss, and under a
data-sharded pjit the (B, B, D) pairwise broadcast induces the cross-chip
all-gather of latent stats automatically.
"""

import math

import jax.numpy as jnp

_LOG_2PI = math.log(2 * math.pi)


def log_density_gaussian(x, mu, logvar):
    """Elementwise diagonal-Gaussian log density; broadcasts like jnp."""
    inv_var = jnp.exp(-logvar)
    return -0.5 * (_LOG_2PI + logvar + (x - mu) ** 2 * inv_var)


def matrix_log_density_gaussian(x, mu, logvar):
    """All-pairs log densities: (B, D) inputs -> (B, B, D) where entry
    [i, j, d] = log N(x[i, d]; mu[j, d], var[j, d])."""
    return log_density_gaussian(x[:, None, :], mu[None, :, :],
                                logvar[None, :, :])


def log_importance_weight_matrix(batch_size, dataset_size,
                                 dtype=jnp.float32):
    """Log weights for minibatch stratified sampling (Chen et al. 2018, eq. S6).

    Exact layout of the reference's strided fill (math.py:54-73). Note the
    fill uses flat stride M+1 == batch_size on a (B, B) matrix, so it writes
    *columns*, not the diagonal:
      everything 1/M; column 0 = 1/N; column 1 = (N-M)/(N*M);
      corner [M-1, 0] = (N-M)/(N*M),
    with N = dataset_size and M = batch_size - 1.
    """
    N = dataset_size
    M = batch_size - 1
    strat_weight = (N - M) / (N * M)
    W = jnp.full((batch_size, batch_size), 1.0 / M, dtype=dtype)
    W = W.at[:, 0].set(1.0 / N)
    W = W.at[:, 1].set(strat_weight)
    W = W.at[M - 1, 0].set(strat_weight)
    return jnp.log(W)
