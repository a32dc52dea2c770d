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


def log_importance_weight_matrix_masked(padded_size, n_valid, dataset_size,
                                        dtype=jnp.float32):
    """MSS log-weights for a batch PADDED to `padded_size` whose first
    `n_valid` rows are real (`n_valid` may be traced).

    Entries inside the valid block equal log_importance_weight_matrix built
    for batch_size == n_valid — including the reference's column fill quirk
    — while padded columns are -inf so the phantom mixture components vanish
    under the downstream logsumexp. Padded ROWS still produce values; callers
    exclude them from batch means. Used by the data-parallel path to keep the
    ragged final batch loss-exact (reference math.py:54-73 with B = the true
    batch size).

    n_valid == 1 is UNDEFINED (M = 0 makes 1/M and strat_weight inf, and the
    (i == n_valid-2) corner never fires) and diverges from the unpadded path,
    which raises on a batch of one just like the reference. The Trainer never
    feeds such a tail (Trainer._skip_tiny_tail raises by default, or skips it
    loudly under skip_tiny_tail=True); library callers must do the same.
    """
    N = jnp.asarray(dataset_size, dtype)
    M = jnp.asarray(n_valid, dtype) - 1.0
    strat_weight = (N - M) / (N * M)
    i = jnp.arange(padded_size)[:, None]
    j = jnp.arange(padded_size)[None, :]
    W = jnp.full((padded_size, padded_size), 1.0, dtype) / M
    W = jnp.where(j == 0, 1.0 / N, W)
    W = jnp.where(j == 1, strat_weight, W)
    W = jnp.where((i == n_valid - 2) & (j == 0), strat_weight, W)
    return jnp.where(j < n_valid, jnp.log(W), -jnp.inf)
