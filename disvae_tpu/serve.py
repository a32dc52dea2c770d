"""Deployment / serving surface.

No reference counterpart (the reference stops at research checkpoints);
this is the production story a TPU-native framework needs:

* `ServingModel` — a jitted inference bundle over a trained results dir:
  batched `encode`, `decode`, `reconstruct`, `sample` with one compiled
  program per (function, batch-bucket), inputs padded to fixed buckets so
  arbitrary request sizes never trigger recompilation.
* `export_artifacts` / `load_artifact` — serialize the encoder/decoder as
  versioned StableHLO functions via `jax.export`: runnable from any JAX
  process (or XLA runtime) WITHOUT this package or its Python model code.

Usage:
    sm = ServingModel.from_dir("results/btcvae_celeba")
    z = sm.encode(images)                 # (N, H, W, C) float32 in [0,1]
    imgs = sm.decode(z)
    export_artifacts("results/btcvae_celeba", batch_size=64)
"""

import os

import numpy as np

import jax
import jax.numpy as jnp
from jax import export as jax_export

from disvae_tpu.utils.modelIO import load_model

_BUCKETS = (1, 8, 64, 256)


def _pad_bucket(n):
    for b in _BUCKETS:
        if n <= b:
            return b
    return ((n + _BUCKETS[-1] - 1) // _BUCKETS[-1]) * _BUCKETS[-1]


class ServingModel:
    """Inference-only bundle: fixed-shape jitted encode/decode."""

    def __init__(self, model, params):
        self.model = model
        self.params = jax.device_put(params)
        self._encode = jax.jit(lambda p, x: model.encode(p, x))
        self._decode = jax.jit(lambda p, z: model.decode(p, z))
        # fused mean-reconstruction: one program, no host round-trip of mu
        self._reconstruct = jax.jit(
            lambda p, x: model.decode(p, model.encode(p, x)[0]))

    @classmethod
    def from_dir(cls, directory):
        model, params = load_model(directory)
        return cls(model, params)

    def _run_bucketed(self, fn, x):
        n = x.shape[0]
        b = _pad_bucket(n)
        if b != n:
            x = np.concatenate([x, np.repeat(x[:1], b - n, axis=0)])
        out = fn(self.params, jnp.asarray(x))
        if isinstance(out, tuple):
            return tuple(np.asarray(o)[:n] for o in out)
        return np.asarray(out)[:n]

    def encode(self, images):
        """(N, H, W, C) images -> (mu, logvar), each (N, latent_dim)."""
        return self._run_bucketed(self._encode, np.asarray(images,
                                                           np.float32))

    def decode(self, latents):
        """(N, latent_dim) -> (N, H, W, C) images in (0, 1)."""
        return self._run_bucketed(self._decode,
                                  np.asarray(latents, np.float32))

    def reconstruct(self, images):
        """Mean (eval-mode) reconstruction: decode(encode(x).mu), fused in
        one compiled call — two separate dispatches would round-trip the
        latents through the host on every request."""
        return self._run_bucketed(self._reconstruct,
                                  np.asarray(images, np.float32))

    def sample(self, n, seed=0):
        """Decode n prior draws."""
        z = jax.random.normal(jax.random.PRNGKey(seed),
                              (n, self.model.latent_dim))
        return self.decode(np.asarray(z))


def export_artifacts(directory, batch_size=64, out_dir=None):
    """Serialize the trained encoder/decoder as StableHLO artifacts
    (`encoder.shlo`, `decoder.shlo`) next to the checkpoint. The artifacts
    embed the weights and run from any JAX >= the export version with
    `load_artifact` — no disvae_tpu needed at serving time."""
    model, params = load_model(directory)
    out_dir = out_dir or directory
    c, h, w = model.img_size

    def encode(x):
        return model.encode(params, x)

    def decode(z):
        return model.decode(params, z)

    specs = {
        "encoder.shlo": (encode, jax.ShapeDtypeStruct((batch_size, h, w, c),
                                                      jnp.float32)),
        "decoder.shlo": (decode,
                         jax.ShapeDtypeStruct((batch_size, model.latent_dim),
                                              jnp.float32)),
    }
    paths = []
    for name, (fn, in_spec) in specs.items():
        exp = jax_export.export(jax.jit(fn))(in_spec)
        path = os.path.join(out_dir, name)
        with open(path, "wb") as f:
            f.write(exp.serialize())
        paths.append(path)
    return paths


def load_artifact(path):
    """Deserialize a .shlo artifact into a callable."""
    with open(path, "rb") as f:
        exp = jax_export.deserialize(f.read())
    return exp.call


def _main(argv):
    import argparse
    parser = argparse.ArgumentParser(
        description="Export a trained run's encoder/decoder as StableHLO "
                    "serving artifacts.")
    parser.add_argument("name", help="run name under results/")
    parser.add_argument("-b", "--batch-size", type=int, default=64)
    parser.add_argument("--res-dir", default="results")
    args = parser.parse_args(argv)
    paths = export_artifacts(os.path.join(args.res_dir, args.name),
                             batch_size=args.batch_size)
    for p in paths:
        print(p)


if __name__ == "__main__":
    import sys
    _main(sys.argv[1:])
