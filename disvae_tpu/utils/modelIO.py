"""Model persistence: params pytree <-> `model.npz`, metadata <-> `specs.json`.

Same contract as reference disvae/utils/modelIO.py:14-153 — checkpoints are
metadata-driven (img_size / latent_dim / model_type read back from specs.json)
so they are architecture-portable — with two TPU-era upgrades:

* the weight file is a flat npz of `path/to/leaf` arrays (framework-neutral,
  mmap-friendly, no pickle execution on load);
* `load_model` transparently reads the reference's torch `model.pt` files via
  utils/torch_compat.py, so a user can point main_viz.py at any of the 38
  shipped pretrained result dirs.
"""

import json
import os
import re

import numpy as np

MODEL_FILENAME = "model.npz"
META_FILENAME = "specs.json"


def _flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        path = prefix + "/" + k if prefix else k
        if isinstance(v, dict):
            out.update(_flatten(v, path))
        else:
            out[path] = np.asarray(v)
    return out


def _unflatten(flat):
    tree = {}
    for path, v in flat.items():
        parts = path.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def save_model(model, params, directory, metadata=None,
               filename=MODEL_FILENAME):
    """Save params + metadata. If no metadata is given, store the minimum
    needed to rebuild (img_size, latent_dim, model_type), as the reference
    does for intra-training checkpoints (modelIO.py:32-35) — but MERGED into
    any existing specs.json rather than replacing it, so a mid-training
    checkpoint (or a preempted run) never erases the full resolved config a
    later eval needs."""
    if metadata is None:
        metadata = dict(img_size=list(model.img_size),
                        latent_dim=model.latent_dim,
                        model_type=model.model_type)
        spec_path = os.path.join(directory, META_FILENAME)
        if os.path.exists(spec_path):
            full = load_metadata(directory)
            full.update(metadata)
            metadata = full
        save_metadata(metadata, directory)
    elif filename == MODEL_FILENAME:
        save_metadata(metadata, directory)
    flat = _flatten(params)
    path = os.path.join(directory, filename)
    tmp = path + ".tmp.npz"
    np.savez(tmp, **flat)
    os.replace(tmp, path)


def save_metadata(metadata, directory, filename=META_FILENAME, **kwargs):
    path = os.path.join(directory, filename)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(metadata, f, indent=4, sort_keys=True, **kwargs)
    os.replace(tmp, path)


def load_metadata(directory, filename=META_FILENAME):
    with open(os.path.join(directory, filename)) as f:
        return json.load(f)


def load_model(directory, filename=MODEL_FILENAME):
    """Rebuild (model, params) from a results directory.

    Falls back to `model.pt` (reference torch format) when the npz is absent,
    and accepts an explicit .pt filename.
    """
    from disvae_tpu.models.vae import init_specific_model

    metadata = load_metadata(directory)
    model = init_specific_model(metadata["model_type"],
                                tuple(metadata["img_size"]),
                                metadata["latent_dim"])
    path = os.path.join(directory, filename)
    if not os.path.exists(path) and filename == MODEL_FILENAME:
        alt = os.path.join(directory, "model.pt")
        if os.path.exists(alt):
            path = alt
    if path.endswith(".pt"):
        from disvae_tpu.utils.torch_compat import load_torch_checkpoint
        params = load_torch_checkpoint(path)
    else:
        with np.load(path) as data:
            params = _unflatten({k: data[k] for k in data.files})
    import jax.numpy as jnp
    import jax
    params = jax.tree_util.tree_map(jnp.asarray, params)
    return model, params


def load_checkpoints(directory):
    """Load every `model-<epoch>.{npz,pt}` checkpoint in a directory tree,
    returning [(epoch, (model, params)), ...] (reference modelIO.py:107-127)."""
    checkpoints = []
    for root, _, filenames in os.walk(directory):
        for filename in filenames:
            # digits-only anchor: must not match leftover atomic-write temp
            # files like model-5.npz.tmp.npz (crash-recovery debris)
            m = re.search(r"-(\d+)\.(npz|pt)$", filename)
            if m is not None:
                epoch_idx = int(m.group(1))
                checkpoints.append((epoch_idx, load_model(root,
                                                          filename=filename)))
    return checkpoints


def numpy_serialize(obj):
    if type(obj).__module__ == np.__name__:
        return obj.tolist() if isinstance(obj, np.ndarray) else obj.item()
    raise TypeError("Unknown type: {}".format(type(obj)))


def save_np_arrays(arrays, directory, filename):
    save_metadata(arrays, directory, filename=filename,
                  default=numpy_serialize)


def load_np_arrays(directory, filename):
    arrays = load_metadata(directory, filename=filename)
    return {k: np.array(v) for k, v in arrays.items()}
