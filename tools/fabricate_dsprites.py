"""Fabricate a full-size dSprites-compatible cache for zero-egress hosts.

The real dataset (reference utils/datasets.py:117-213) is a deterministic
737,280-image lattice over (shape:3, scale:6, orientation:40, posX:32,
posY:32) of binary 64x64 sprites. This script renders the same lattice
synthetically — square / ellipse / heart silhouettes, supersampled then
thresholded — so the factor->image map has the same structure (each factor
changes the image smoothly and independently). MIG/AAM computed on a model
trained on this cache is meaningful, though its absolute value is not
comparable to published dSprites numbers.

Writes `data/dsprites/dsprites_imgs.npy` (uint8 {0,1}, (N,64,64,1) memmap)
and `dsprites_latents.npy` (f32 (N,6): color, shape, scale, orientation,
posX, posY — same column order as the reference's `latents_values`).

Usage: python tools/fabricate_dsprites.py [--root data/dsprites]
"""

import argparse
import os

import numpy as np
from numpy.lib.format import open_memmap

LAT_SIZES = (3, 6, 40, 32, 32)
N = int(np.prod(LAT_SIZES))
SS = 4  # supersampling factor for the canonical sprite render
PATCH = 30  # canonical sprite canvas (px); 64 - PATCH px of travel


def _canonical(shape_idx, scale, orientation):
    """Render one centred sprite silhouette on a PATCH x PATCH canvas."""
    n = PATCH * SS
    # Coordinates in sprite units: canvas spans [-1.5, 1.5].
    ax = np.linspace(-1.5, 1.5, n)
    xx, yy = np.meshgrid(ax, ax)
    c, s = np.cos(orientation), np.sin(orientation)
    u = c * xx + s * yy
    v = -s * xx + c * yy
    u, v = u / scale, v / scale
    if shape_idx == 0:  # square
        mask = (np.abs(u) <= 0.75) & (np.abs(v) <= 0.75)
    elif shape_idx == 1:  # ellipse
        mask = (u / 0.9) ** 2 + (v / 0.55) ** 2 <= 1.0
    else:  # heart
        hu, hv = u / 0.8, -v / 0.8
        mask = (hu ** 2 + hv ** 2 - 1) ** 3 - hu ** 2 * hv ** 3 <= 0
    frac = mask.astype(np.float32).reshape(PATCH, SS, PATCH, SS)
    return (frac.mean(axis=(1, 3)) >= 0.5).astype(np.uint8)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default=os.path.join(
        os.environ.get("DISVAE_DATA_ROOT",
                       os.path.join(os.getcwd(), "data")), "dsprites"))
    args = ap.parse_args()
    os.makedirs(args.root, exist_ok=True)

    scales = np.linspace(0.5, 1, 6)
    orients = np.linspace(0, 2 * np.pi, 40)
    pos = np.linspace(0, 1, 32)
    travel = 64 - PATCH
    offs = np.round(pos * travel).astype(int)

    imgs_path = os.path.join(args.root, "dsprites_imgs.npy")
    imgs = open_memmap(imgs_path + ".tmp.npy", mode="w+", dtype=np.uint8,
                       shape=(N, 64, 64, 1))
    row = 0
    for sh in range(3):
        for sc in range(6):
            for orr in range(40):
                patch = _canonical(sh, scales[sc], orients[orr])
                block = np.zeros((32, 32, 64, 64), np.uint8)
                for ix in range(32):
                    x0 = offs[ix]
                    for iy in range(32):
                        y0 = offs[iy]
                        block[ix, iy, y0:y0 + PATCH, x0:x0 + PATCH] = patch
                imgs[row:row + 1024] = block.reshape(1024, 64, 64, 1)
                row += 1024
            print("shape {} scale {} done ({}/{})".format(sh, sc, row, N),
                  flush=True)
    imgs.flush()
    del imgs
    os.replace(imgs_path + ".tmp.npy", imgs_path)

    grids = np.meshgrid(np.arange(3), scales, orients, pos, pos,
                        indexing="ij")
    lat = np.stack([np.ones(N, np.float32)]
                   + [g.reshape(N).astype(np.float32) for g in grids],
                   axis=1)
    lat[:, 1] += 1.0  # shape values are 1,2,3
    np.save(os.path.join(args.root, "dsprites_latents.npy"), lat)
    print("wrote {} ({} imgs) + latents".format(imgs_path, N))


if __name__ == "__main__":
    main()
