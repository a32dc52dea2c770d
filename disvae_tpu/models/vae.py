"""VAE model container: a static config plus pure init/apply functions.

Mirrors the reference's VAE class surface (disvae/models/vae.py:29-101) —
forward -> (reconstruction, (mu, logvar), latent_sample), reparameterize
(train: mu + sigma*eps, eval: mu), sample_latent — but as a frozen dataclass
holding only static metadata, with all state in an explicit params pytree and
all randomness in explicit PRNG keys. That makes every method jit-safe and
lets one compiled train step serve the whole run.
"""

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from disvae_tpu.models import burgess

MODELS = ["Burgess"]


def init_specific_model(model_type, img_size, latent_dim, key=None,
                        dtype=jnp.float32, compute_dtype="float32"):
    """Build a (model, params) pair for `model_type`.

    Parity surface of reference disvae/models/vae.py:15-26; additionally takes
    the PRNG key (JAX has no global RNG) and returns params separately from
    the stateless model description.
    """
    model_type = model_type.lower().capitalize()
    if model_type not in MODELS:
        raise ValueError("Unknown model_type={}. Possible values: {}"
                         .format(model_type, MODELS))
    model = VAE(img_size=tuple(img_size), latent_dim=latent_dim,
                model_type=model_type, compute_dtype=compute_dtype)
    if key is None:
        return model
    return model, model.init(key, dtype=dtype)


@dataclass(frozen=True)
class VAE:
    """Static description of a Burgess VAE. Hashable, so usable as a jit
    static argument."""
    img_size: tuple  # (C, H, W), channels-first in metadata as in reference
    latent_dim: int = 10
    model_type: str = "Burgess"
    # "bfloat16" runs the conv/FC stacks with bf16 activations+weights
    # (f32 heads/losses); see burgess.apply_encoder for measurements.
    compute_dtype: str = "float32"

    def __post_init__(self):
        burgess._is_64(self.img_size)  # validates 32^2 / 64^2

    @property
    def num_pixels(self):
        return self.img_size[1] * self.img_size[2]

    def init(self, key, dtype=jnp.float32):
        k_enc, k_dec = jax.random.split(key)
        return {
            "encoder": burgess.init_encoder(k_enc, self.img_size,
                                            self.latent_dim, dtype),
            "decoder": burgess.init_decoder(k_dec, self.img_size,
                                            self.latent_dim, dtype),
        }

    @property
    def _cdtype(self):
        return None if self.compute_dtype == "float32" else \
            jnp.dtype(self.compute_dtype)

    def encode(self, params, x):
        return burgess.apply_encoder(params["encoder"], x, self.latent_dim,
                                     compute_dtype=self._cdtype)

    def decode(self, params, z):
        return burgess.apply_decoder(params["decoder"], z,
                                     compute_dtype=self._cdtype)

    def reparameterize(self, mean, logvar, rng=None, is_train=True):
        """Train: mu + exp(logvar/2) * eps; eval: mu (reference vae.py:52-71)."""
        if not is_train or rng is None:
            return mean
        std = jnp.exp(0.5 * logvar)
        eps = jax.random.normal(rng, mean.shape, mean.dtype)
        return mean + std * eps

    def apply(self, params, x, rng=None, is_train=True):
        """Full forward pass: x (N,H,W,C) -> (recon, (mu, logvar), z)."""
        mean, logvar = self.encode(params, x)
        z = self.reparameterize(mean, logvar, rng, is_train)
        recon = self.decode(params, z)
        return recon, (mean, logvar), z

    def sample_latent(self, params, x, rng=None, is_train=True):
        mean, logvar = self.encode(params, x)
        return self.reparameterize(mean, logvar, rng, is_train)
