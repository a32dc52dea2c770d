"""PyTorch <-> JAX checkpoint conversion for the Burgess VAE.

The reference ships 38 pretrained `model.pt` state dicts (reference
disvae/utils/modelIO.py:14-42). Converting them into our params pytree gives
bitwise-checkable forward parity, which anchors every other numeric in the
framework. torch is imported lazily — nothing on the TPU compute path
depends on it.

Layout mapping (see models/burgess.py):
  * Linear:       torch (out, in)        -> ours (in, out)        [transpose]
  * Conv2d:       torch OIHW             -> ours HWIO             [transpose]
  * ConvTranspose2d: torch (in, out, kh, kw) -> the HWIO kernel of the
    equivalent input-dilated forward conv: spatial flip + transpose to
    (kh, kw, in, out).
"""

import numpy as np

_LINEAR_KEYS_ENC = ["lin1", "lin2", "mu_logvar_gen"]
_LINEAR_KEYS_DEC = ["lin1", "lin2", "lin3"]


def _linear(sd, prefix):
    return {"w": np.ascontiguousarray(sd[prefix + ".weight"].T),
            "b": np.ascontiguousarray(sd[prefix + ".bias"])}


def _conv(sd, prefix):
    w = sd[prefix + ".weight"]  # OIHW
    return {"w": np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0))),
            "b": np.ascontiguousarray(sd[prefix + ".bias"])}


def _conv_transpose(sd, prefix):
    w = sd[prefix + ".weight"]  # (in, out, kh, kw)
    w = w[:, :, ::-1, ::-1]  # spatial flip
    return {"w": np.ascontiguousarray(np.transpose(w, (2, 3, 0, 1))),
            "b": np.ascontiguousarray(sd[prefix + ".bias"])}


def torch_state_dict_to_params(state_dict):
    """Convert a reference VAE state dict (tensors or ndarrays) to our pytree."""
    sd = {k: (v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v))
          for k, v in state_dict.items()}
    enc = {}
    for k in ["conv1", "conv2", "conv3", "conv_64"]:
        if "encoder." + k + ".weight" in sd:
            enc[k] = _conv(sd, "encoder." + k)
    for k in _LINEAR_KEYS_ENC:
        enc[k] = _linear(sd, "encoder." + k)
    dec = {}
    for k in _LINEAR_KEYS_DEC:
        dec[k] = _linear(sd, "decoder." + k)
    for k in ["convT_64", "convT1", "convT2", "convT3"]:
        if "decoder." + k + ".weight" in sd:
            dec[k] = _conv_transpose(sd, "decoder." + k)
    return {"encoder": enc, "decoder": dec}


def load_torch_checkpoint(path):
    """Load a reference `model.pt` and convert it to our params pytree."""
    import torch
    state_dict = torch.load(path, map_location="cpu", weights_only=True)
    return torch_state_dict_to_params(state_dict)


def torch_burgess_forward(sd, x, latent_dim=10):
    """Reference Burgess forward (eval mode, z = mu) straight from a raw
    torch state dict — the golden side of the forward/gradient parity gates
    (tests/test_torch_parity.py) and the on-chip precision probe
    (tools/precision_parity_probe.py). Mirrors reference
    disvae/models/encoders.py:69-89 and decoders.py:67-84. Returns
    (mu, logvar, reconstruction) as torch tensors (NCHW)."""
    import torch
    import torch.nn.functional as F
    h = x
    for name in ["conv1", "conv2", "conv3", "conv_64"]:
        key = "encoder.{}.weight".format(name)
        if key in sd:
            h = F.relu(F.conv2d(h, sd[key],
                                sd[key.replace("weight", "bias")],
                                stride=2, padding=1))
    h = h.reshape(h.shape[0], -1)
    h = F.relu(F.linear(h, sd["encoder.lin1.weight"],
                        sd["encoder.lin1.bias"]))
    h = F.relu(F.linear(h, sd["encoder.lin2.weight"],
                        sd["encoder.lin2.bias"]))
    ml = F.linear(h, sd["encoder.mu_logvar_gen.weight"],
                  sd["encoder.mu_logvar_gen.bias"])
    mu, logvar = ml.view(-1, latent_dim, 2).unbind(-1)
    d = F.relu(F.linear(mu, sd["decoder.lin1.weight"],
                        sd["decoder.lin1.bias"]))
    d = F.relu(F.linear(d, sd["decoder.lin2.weight"],
                        sd["decoder.lin2.bias"]))
    d = F.relu(F.linear(d, sd["decoder.lin3.weight"],
                        sd["decoder.lin3.bias"]))
    d = d.view(-1, 32, 4, 4)
    for name in ["convT_64", "convT1", "convT2"]:
        key = "decoder.{}.weight".format(name)
        if key in sd:
            d = F.relu(F.conv_transpose2d(d, sd[key],
                                          sd[key.replace("weight", "bias")],
                                          stride=2, padding=1))
    d = torch.sigmoid(F.conv_transpose2d(d, sd["decoder.convT3.weight"],
                                         sd["decoder.convT3.bias"],
                                         stride=2, padding=1))
    return mu, logvar, d


def params_to_torch_state_dict(params):
    """Inverse conversion, for exporting our checkpoints to reference format."""
    import torch
    sd = {}
    enc, dec = params["encoder"], params["decoder"]
    for k in ["conv1", "conv2", "conv3", "conv_64"]:
        if k in enc:
            w = np.transpose(np.asarray(enc[k]["w"]), (3, 2, 0, 1))
            sd["encoder." + k + ".weight"] = torch.from_numpy(np.ascontiguousarray(w))
            sd["encoder." + k + ".bias"] = torch.from_numpy(np.asarray(enc[k]["b"]))
    for k in _LINEAR_KEYS_ENC:
        sd["encoder." + k + ".weight"] = torch.from_numpy(
            np.ascontiguousarray(np.asarray(enc[k]["w"]).T))
        sd["encoder." + k + ".bias"] = torch.from_numpy(np.asarray(enc[k]["b"]))
    for k in _LINEAR_KEYS_DEC:
        sd["decoder." + k + ".weight"] = torch.from_numpy(
            np.ascontiguousarray(np.asarray(dec[k]["w"]).T))
        sd["decoder." + k + ".bias"] = torch.from_numpy(np.asarray(dec[k]["b"]))
    for k in ["convT_64", "convT1", "convT2", "convT3"]:
        if k in dec:
            w = np.transpose(np.asarray(dec[k]["w"]), (2, 3, 0, 1))[:, :, ::-1, ::-1]
            sd["decoder." + k + ".weight"] = torch.from_numpy(np.ascontiguousarray(w))
            sd["decoder." + k + ".bias"] = torch.from_numpy(np.asarray(dec[k]["b"]))
    return sd
