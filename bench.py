"""Headline benchmark: btcvae_celeba-shaped training throughput, batch 256,
one chip. Prints ONE JSON line.

Measures the production train path: the K-step lax.scan super-step
(train/steps.py make_multi_train_step) with flattened Adam, synced by an
actual device->host fetch of the final metrics — on this platform
`block_until_ready` can return before results are fetchable, so a data
dependency is the only honest barrier.

Baseline anchoring (BASELINE.md): the reference publishes no throughput
number. Measured here on this host: reference torch-CPU btcvae b256 =
367.9 img/s (5-step mean after warmup, /root/reference @ seed 0). The
north-star target is >=10x the reference's *GPU* rate; REF_GPU_IPS below is
a V100-class estimate for this ~500K-param conv VAE (documented, not
measured — no GPU in this environment). vs_baseline = ours / REF_GPU_IPS,
so vs_baseline >= 10 meets the BASELINE.json target.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from disvae_tpu.models.vae import init_specific_model
from disvae_tpu.ops.losses import BtcvaeLoss, metric_key_order
from disvae_tpu.train.state import create_train_state
from disvae_tpu.train.steps import (make_multi_train_step, make_optimizer,
                                    stack_metrics)

REF_GPU_IPS = 3000.0  # estimated reference GPU img/s (see module docstring)
BATCH = 256
K = 16          # steps per dispatch (lax.scan super-step)
SUPERSTEPS = 20  # timed supersteps -> 320 train steps


def main():
    model, params = init_specific_model("Burgess", (3, 64, 64), 10,
                                        key=jax.random.PRNGKey(0))
    # btcvae_celeba hyperparams (hyperparam.ini [Common_btcvae]/[btcvae_celeba])
    loss_cfg = BtcvaeLoss(n_data=202599, alpha=1.0, beta=6.0, gamma=1.0,
                          steps_anneal=0)
    optimizer = make_optimizer(5e-4)
    state = create_train_state(model, params, optimizer,
                               jax.random.PRNGKey(1))
    multi = make_multi_train_step(model, loss_cfg, optimizer)
    keys = metric_key_order(loss_cfg.name, model.latent_dim)

    rng = np.random.RandomState(0)
    batches = jax.device_put(
        rng.rand(K, BATCH, 64, 64, 3).astype(np.float32))

    def fetch(metrics):
        # device->host dependency on every step's loss = the sync barrier
        return np.asarray(stack_metrics(metrics, keys))

    # warmup: compile + first (expensive) transfer on this platform
    for _ in range(2):
        state, metrics = multi(state, batches)
    vals = fetch(metrics)
    assert np.isfinite(vals).all(), vals

    t0 = time.perf_counter()
    for _ in range(SUPERSTEPS):
        state, metrics = multi(state, batches)
    fetch(metrics)
    dt = time.perf_counter() - t0

    ips = BATCH * K * SUPERSTEPS / dt
    print(json.dumps({
        "metric": "train_images_per_sec_btcvae_celeba_b256_1chip",
        "value": round(ips, 1),
        "unit": "images/sec",
        "vs_baseline": round(ips / REF_GPU_IPS, 3),
    }))


if __name__ == "__main__":
    main()
