"""disvae_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for training and
evaluating disentangled variational autoencoders.

Re-designed from scratch for TPU hardware with the same capabilities as the
PyTorch reference `YannDubs/disentangling-vae`:

* Burgess conv VAE (32x32 / 64x64) as pure functional init/apply pairs in NHWC
  layout (reference: disvae/models/vae.py, encoders.py, decoders.py).
* Five interchangeable losses — VAE, betaH, betaB, factor (adversarial),
  btcvae (decomposed ELBO) — as jit-fused pure functions
  (reference: disvae/models/losses.py).
* A host->HBM input pipeline over mnist/fashion/dsprites/celeba/chairs
  (reference: utils/datasets.py).
* Trainer / Evaluator orchestration with byte-compatible artifact outputs
  (train_losses.log, test_losses.log, metrics.log, specs.json)
  (reference: disvae/training.py, disvae/evaluate.py).
* MIG / AAM disentanglement metrics computed device-side
  (reference: disvae/evaluate.py:119-317).
* Latent-traversal visualizations (PNG grids + GIFs)
  (reference: utils/visualize.py).
* Data-parallel scaling over a `jax.sharding.Mesh` with optional tensor
  parallel hooks (no reference counterpart — the reference is single-device).
"""

__version__ = "0.1.0"

from disvae_tpu.models.vae import init_specific_model, MODELS  # noqa: F401
from disvae_tpu.ops.losses import LOSSES, RECON_DIST, get_loss_f  # noqa: F401
from disvae_tpu.train.trainer import Trainer  # noqa: F401
from disvae_tpu.train.evaluate import Evaluator  # noqa: F401
