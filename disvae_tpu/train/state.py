"""Functional training state.

Everything the reference kept as Python object state — model weights, Adam
moments (main.py:208), the discriminator and its second Adam (losses.py:
229-238), the `n_train_steps` counter (losses.py:105-107), the RNG — lives in
one pytree so a single compiled step function can thread it with donated
buffers (zero-copy in-place updates in HBM).
"""

import flax.struct
import jax
import jax.numpy as jnp



@flax.struct.dataclass
class TrainState:
    params: dict
    opt_state: object
    step: jnp.ndarray          # int32 scalar; counted like the reference's
    rng: jax.Array             # n_train_steps (incremented before use)
    disc_params: dict = None
    disc_opt_state: object = None
    # Sweepable loss hyperparameters as a traced f32 vector (see
    # ops/losses.py coef_vector): carrying them in the state keeps the
    # compiled step's HLO identical across hyperparameter values, so sweep
    # processes (bin/train_mutual_info.sh) share one persistent-cache
    # entry instead of recompiling per value. None = constants baked in
    # (library callers that build states without a loss_cfg).
    coefs: jnp.ndarray = None


def create_train_state(model, params, optimizer, rng, disc=None,
                       disc_optimizer=None, disc_rng=None, loss_cfg=None):
    disc_params = None
    disc_opt_state = None
    if disc is not None:
        disc_params = disc.init(disc_rng)
        disc_opt_state = disc_optimizer.init(disc_params)
    coefs = None
    if loss_cfg is not None:
        from disvae_tpu.ops.losses import coef_vector
        coefs = coef_vector(loss_cfg)
    return TrainState(
        params=params,
        opt_state=optimizer.init(params),
        step=jnp.zeros((), jnp.int32),
        rng=rng,
        disc_params=disc_params,
        disc_opt_state=disc_opt_state,
        coefs=coefs,
    )
