"""Plotting helpers: grid assembly, log parsing, gif concatenation.

Counterpart of reference utils/viz_helpers.py:16-148, torch-free: grids are
assembled in numpy (same geometry as torchvision make_grid — 2px padding,
`nrow` images per row, pad_value border) so the rendered PNGs line up with
the reference's pixel-for-pixel given equal inputs.
"""

import random

import imageio
import numpy as np
from PIL import Image, ImageDraw

FPS_GIF = 12


def get_samples(dataset, num_samples, idcs=None):
    """Fixed indices first, random fill after (reference viz_helpers.py:16-38).
    Returns float32 (N, H, W, C)."""
    from disvae_tpu.data.datasets import get_dataset
    idcs = list(idcs) if idcs is not None else []  # `if idcs` breaks on arrays
    ds = dataset if not isinstance(dataset, str) else get_dataset(dataset)()
    if len(idcs) > num_samples:
        idcs = idcs[:num_samples]
    idcs += random.sample(range(len(ds)), num_samples - len(idcs))
    samples, _ = ds.get_batch(np.asarray(idcs))
    print("Selected idcs: {}".format(idcs))
    return samples


def sort_list_by_other(to_sort, other, reverse=True):
    """Sort a list by another list's values."""
    return [el for _, el in sorted(zip(other, to_sort), key=lambda p: p[0],
                                   reverse=reverse)]


def read_loss_from_file(log_file_path, loss_to_fetch):
    """Per-dimension values of `loss_to_fetch` ('kl_loss_') at the final
    logged epoch, ordered by dimension index (reference viz_helpers.py:47-65).
    The `Epoch,Loss,Value` schema of train_losses.log is load-bearing here."""
    import pandas as pd
    logs = pd.read_csv(log_file_path)
    last = logs[logs["Epoch"] == logs["Epoch"].max()]
    last = last[last["Loss"].str.startswith(loss_to_fetch)]
    dims = last["Loss"].str.replace(loss_to_fetch, "", regex=False).astype(int)
    return list(last.assign(_d=dims).sort_values("_d")["Value"])


def make_grid(imgs, nrow=8, padding=2, pad_value=0.0):
    """torchvision-compatible image grid. imgs: float (B, H, W, C) in [0,1].
    Returns float (H', W', C)."""
    b, h, w, c = imgs.shape
    xmaps = min(nrow, b)
    ymaps = int(np.ceil(b / xmaps))
    H, W = h + padding, w + padding
    grid = np.full((ymaps * H + padding, xmaps * W + padding, c), pad_value,
                   dtype=np.float32)
    for idx in range(b):
        y, x = divmod(idx, xmaps)
        grid[y * H + padding:y * H + padding + h,
             x * W + padding:x * W + padding + w] = imgs[idx]
    return grid


def make_grid_img(imgs, **kwargs):
    """Grid as uint8 HWC (RGB if C==3 else single channel replicated),
    ready for imageio/PIL."""
    grid = make_grid(np.asarray(imgs), **kwargs)
    grid = np.clip(grid * 255 + 0.5, 0, 255).astype(np.uint8)
    if grid.shape[-1] == 1:
        grid = np.repeat(grid, 3, axis=-1)
    return grid


def save_image(imgs, filename, **kwargs):
    """Assemble a grid and write it as PNG."""
    Image.fromarray(make_grid_img(imgs, **kwargs)).save(filename)


def get_image_list(image_file_name_list):
    return [Image.open(f) for f in image_file_name_list]


def arr_im_convert(arr, convert="RGBA"):
    """Convert an image array to another PIL mode."""
    return np.asarray(Image.fromarray(arr).convert(convert))


def mimsave(filename, images, fps=FPS_GIF):
    """GIF writer tolerant to imageio v2/v3 fps/duration API differences."""
    try:
        imageio.mimsave(filename, images, fps=fps)
    except TypeError:
        imageio.mimsave(filename, images, duration=1000.0 / fps)


def plot_grid_gifs(filename, grid_files, pad_size=7, pad_values=255):
    """Merge a 2D grid of gif files into one gif with padding (reference
    viz_helpers.py:126-141; used by bin/plot_all.sh)."""
    grid_gifs = [[imageio.mimread(f) for f in row] for row in grid_files]
    n_per_gif = len(grid_gifs[0][0])
    imgs = [concatenate_pad([concatenate_pad(
        [arr_im_convert(gif[i], convert="RGBA") for gif in row],
        pad_size, pad_values, axis=1) for row in grid_gifs],
        pad_size, pad_values, axis=0)
        for i in range(n_per_gif)]
    mimsave(filename, imgs)


def concatenate_pad(arrays, pad_size, pad_values, axis=0):
    """Concatenate arrays with constant padding between, before and after."""
    pad = np.ones_like(arrays[0]).take(range(pad_size), axis=axis) * pad_values
    new_arrays = [pad]
    for arr in arrays:
        new_arrays += [arr, pad]
    return np.concatenate(new_arrays, axis=axis)


def add_labels(input_image, labels):
    """Add text labels in a 100px margin right of the image rows
    (reference viz_helpers.py:68-90)."""
    if isinstance(input_image, np.ndarray):
        input_image = Image.fromarray(input_image)
    new_width = input_image.width + 100
    new_img = Image.new("RGB", (new_width, input_image.height), color="white")
    new_img.paste(input_image, (0, 0))
    draw = ImageDraw.Draw(new_img)
    for i, s in enumerate(labels):
        draw.text(xy=(new_width - 100 + 0.005,
                      int((i / len(labels) + 1 / (2 * len(labels)))
                          * input_image.height)),
                  text=s, fill=(0, 0, 0))
    return new_img
