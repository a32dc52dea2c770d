"""ON-CHIP numeric parity probe for a matmul/conv precision policy.

The CPU test suite's parity gates (tests/test_torch_parity.py) always run
at f32, so they cannot say what `--precision high` or `default` cost in
ACCURACY on the TPU, where those policies select bf16 MXU pass counts.
This probe runs the same three gates on the real chip at one policy:

  1. forward parity on the shipped VAE_mnist checkpoint (converted weights)
     vs the torch reference forward on CPU               [test tol: 1e-5/1e-4]
  2. gradient parity of the betaH loss on those weights   [test tol: 1e-3 rel]
  3. a 10-epoch betaH training curve on a deterministic 256-image set vs
     the LIVE torch reference trained from identical weights
                                                          [test tol: 5% rel]

One invocation per policy (the tunnel rule: one numeric policy per
process; compiles are cached across invocations):

    python tools/precision_parity_probe.py <highest|high|default>

Prints one JSON line; results recorded in README's precision-decision note.
Reference counterparts: disvae/models/{encoders,decoders}.py forward,
losses.py:139-153 betaH, training.py:137-164 loop.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from bench import _progress  # noqa: E402  (repo root on sys.path above)

CKPT = "/root/reference/results/VAE_mnist/model.pt"


def main(policy):
    import jax
    import jax.numpy as jnp
    import torch
    import torch.nn.functional as F

    from disvae_tpu.models.vae import init_specific_model
    from disvae_tpu.ops import losses as L
    from disvae_tpu.ops.precision import configure
    from disvae_tpu.utils.torch_compat import load_torch_checkpoint

    configure(policy)
    _progress("policy={} on {}".format(policy, jax.devices()[0].platform))

    sys.path.insert(0, "/root/reference")
    np.product = np.prod  # the reference uses the numpy<2 alias
    torch.backends.mkldnn.enabled = False  # see test_torch_parity.py:224-227

    sd = torch.load(CKPT, map_location="cpu", weights_only=True)
    params = jax.tree_util.tree_map(jnp.asarray, load_torch_checkpoint(CKPT))
    model = init_specific_model("Burgess", (1, 32, 32), 10)
    beta = 4.0
    cfg = L.BetaHLoss(beta=beta, steps_anneal=0)

    # ---- torch golden forward + grads (CPU, f32) ----
    from disvae_tpu.utils.torch_compat import torch_burgess_forward \
        as _torch_burgess_forward
    x = np.random.RandomState(1).rand(4, 1, 32, 32).astype(np.float32)
    sd_g = {k: v.clone().requires_grad_(True) for k, v in sd.items()}
    mu_t, lv_t, rec_t = _torch_burgess_forward(sd_g, torch.from_numpy(x))
    rec_loss = F.binary_cross_entropy(rec_t, torch.from_numpy(x),
                                      reduction="sum") / 4
    kl = (0.5 * (-1 - lv_t + mu_t.pow(2) + lv_t.exp()).mean(dim=0)).sum()
    (rec_loss + beta * kl).backward()

    # ---- on-chip forward + grads at `policy` ----
    x_nhwc = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))

    def loss_fn(p):
        recon, latent_dist, z = model.apply(p, x_nhwc, rng=None,
                                            is_train=False)
        loss, _ = cfg(x_nhwc, recon, latent_dist, False, 0, latent_sample=z)
        return loss, (recon, latent_dist)

    _progress("compiling forward+grad...")
    (loss, (rec_j, (mu_j, lv_j))), grads = jax.jit(
        jax.value_and_grad(loss_fn, has_aux=True))(params)
    fwd_dev = max(
        float(np.abs(np.asarray(mu_j) - mu_t.detach().numpy()).max()),
        float(np.abs(np.asarray(lv_j) - lv_t.detach().numpy()).max()),
        float(np.abs(np.transpose(np.asarray(rec_j), (0, 3, 1, 2))
                     - rec_t.detach().numpy()).max()))

    from disvae_tpu.utils.torch_compat import params_to_torch_state_dict
    grads_sd = params_to_torch_state_dict(
        jax.tree_util.tree_map(np.asarray, grads))
    grad_dev = 0.0
    for k in sd_g:
        expect = sd_g[k].grad.numpy()
        scale = max(np.abs(expect).max(), 1e-3)
        grad_dev = max(grad_dev,
                       float(np.abs(grads_sd[k].numpy() - expect).max()
                             / scale))
    _progress("forward dev {:.2e}, grad rel dev {:.2e}".format(fwd_dev,
                                                               grad_dev))

    # ---- 10-epoch training-curve parity vs the live reference ----
    from disvae_tpu.data.datasets import ArrayDataset, DataLoader
    from disvae_tpu.train.trainer import Trainer
    from disvae.models.vae import init_specific_model as torch_init
    from disvae.models.losses import get_loss_f as torch_loss_f

    rng = np.random.RandomState(0)
    imgs = np.zeros((256, 32, 32, 1), np.float32)
    ys, xs = np.mgrid[0:32, 0:32]
    for i in range(256):
        cy, cx, r = rng.randint(8, 24), rng.randint(8, 24), rng.randint(3, 9)
        imgs[i, :, :, 0] = (((ys - cy) ** 2 + (xs - cx) ** 2) < r * r)
    lr, bs, epochs = 1e-3, 64, 10

    m2, p2 = init_specific_model("Burgess", (1, 32, 32), 10,
                                 key=jax.random.PRNGKey(0))
    p2_np = jax.tree_util.tree_map(np.asarray, p2)
    loader = DataLoader(ArrayDataset((imgs * 255).astype(np.uint8)),
                        batch_size=bs, shuffle=False)
    import tempfile
    trainer = Trainer(m2, p2, L.BetaHLoss(beta=beta, steps_anneal=0), lr=lr,
                      rng=jax.random.PRNGKey(1),
                      save_dir=tempfile.mkdtemp(prefix="prec_probe_"),
                      is_progress_bar=False)
    _progress("training 10 epochs on chip...")
    t0 = time.perf_counter()
    ours = [trainer._train_epoch(loader, e)[0] for e in range(epochs)]
    chip_seconds = time.perf_counter() - t0

    _progress("training torch reference on CPU...")
    tmodel = torch_init("Burgess", (1, 32, 32), 10)
    tmodel.load_state_dict(params_to_torch_state_dict(p2_np))
    tmodel.train()
    opt = torch.optim.Adam(tmodel.parameters(), lr=lr)
    loss_f = torch_loss_f("betaH", n_data=256, device=torch.device("cpu"),
                          rec_dist="bernoulli", reg_anneal=0, betaH_B=beta)
    x_all = torch.from_numpy(np.ascontiguousarray(
        np.transpose(np.round(imgs * 255) / 255, (0, 3, 1, 2)))).float()
    theirs = []
    torch.manual_seed(0)
    for _ in range(epochs):
        ep = []
        for i in range(0, 256, bs):
            xb = x_all[i:i + bs]
            recon, latent_dist, latent_sample = tmodel(xb)
            tl = loss_f(xb, recon, latent_dist, True, None,
                        latent_sample=latent_sample)
            opt.zero_grad(); tl.backward(); opt.step()
            ep.append(tl.item())
        theirs.append(float(np.mean(ep)))

    curve_rel = float((np.abs(np.asarray(ours) - np.asarray(theirs))
                       / np.abs(theirs)).max())
    print(json.dumps({
        "policy": policy,
        "platform": jax.devices()[0].platform,
        "forward_max_abs_dev": fwd_dev,
        "grad_max_rel_dev": grad_dev,
        "curve_max_rel_dev": round(curve_rel, 5),
        "curve_final_ours": round(float(ours[-1]), 3),
        "curve_final_torch": round(float(theirs[-1]), 3),
        "train_10epoch_seconds": round(chip_seconds, 1),
        "gate_tolerances": {"forward": 1e-4, "grad_rel": 1e-3,
                            "curve_rel": 0.05},
    }))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "highest")
