"""Fabricate a LEARNABLE CelebA-compatible cache for zero-egress hosts.

The real dataset (reference utils/datasets.py:216-291) is 202,599 aligned
RGB face crops, resized to 64x64 by the loader cache. Faces are not
parametric, but a VAE does not need faces to demonstrate learning — it
needs a smooth low-dimensional generative manifold. This script renders
the same count of cartoon "portrait" images driven by ~12 continuous
factors (background hue, face position/scale/aspect, skin tone, hair
color + fringe height, eye separation/size, smile curvature, mouth
width), so the flagship btcvae_celeba config trained on the cache shows a
real learning curve and ANIMATED latent traversals instead of pinning at
the BCE entropy floor the way an unlearnable noise cache does.

Everything is vectorized numpy: a chunk of images is rasterized at once
from (B, 1, 1)-broadcast factor arrays against a (64, 64) coordinate
grid, written straight into the `data/celeba/celeba_64.npy` memmap the
`disvae_tpu.data.datasets.CelebA` loader reads directly (uint8,
(N, 64, 64, 3)). Full count takes ~1-2 min on the host.

Usage: python tools/fabricate_celeba.py [--root data/celeba] [--n 202599]
"""

import argparse
import os

import numpy as np
from numpy.lib.format import open_memmap

N_REF = 202599  # len(img_align_celeba/*.jpg) in the real dataset

H = 64
_Y, _X = np.mgrid[0:H, 0:H].astype(np.float32)


def sample_factors(rng, n):
    """Draw n continuous factor vectors. Returned dict of (n,) float32."""
    u = lambda lo, hi: rng.uniform(lo, hi, n).astype(np.float32)
    return {
        "bg_hue": u(0.0, 1.0),          # background color angle
        "cx": u(28.0, 36.0),            # face center
        "cy": u(30.0, 38.0),
        "scale": u(0.75, 1.25),         # face size multiplier
        "aspect": u(0.80, 1.00),        # rx / ry
        "skin": u(0.0, 1.0),            # skin-tone position on a ramp
        "hair_hue": u(0.0, 1.0),        # hair color angle
        "fringe": u(0.15, 0.55),        # hairline depth (fraction of ry)
        "eye_sep": u(0.34, 0.52),       # eye separation (fraction of rx)
        "eye_size": u(1.4, 2.6),        # eye radius in px (pre-scale)
        "smile": u(-1.0, 1.0),          # mouth curvature (-frown..+smile)
        "mouth_w": u(0.30, 0.55),       # mouth half-width (fraction of rx)
    }


def _hue_rgb(hue, sat=0.55, val=0.85):
    """Cheap smooth hue -> RGB ramp (three phase-shifted cosines), (n, 3)."""
    ang = 2.0 * np.pi * np.asarray(hue, np.float32)
    phases = np.array([0.0, 2.0 * np.pi / 3.0, 4.0 * np.pi / 3.0],
                      np.float32)
    base = 0.5 + 0.5 * np.cos(ang[..., None] - phases)
    return (val * (1.0 - sat + sat * base)).astype(np.float32)


def _skin_rgb(skin):
    """Skin-tone ramp from light (1.0, 0.87, 0.77) to deep (0.45, 0.31, 0.22)."""
    light = np.array([1.00, 0.87, 0.77], np.float32)
    deep = np.array([0.45, 0.31, 0.22], np.float32)
    t = np.asarray(skin, np.float32)[..., None]
    return light + t * (deep - light)


def render_faces(f):
    """Rasterize one chunk. `f` is a dict of (B,) factor arrays (see
    sample_factors). Returns uint8 (B, 64, 64, 3)."""
    B = f["cx"].shape[0]
    e = lambda a: np.asarray(a, np.float32).reshape(B, 1, 1)

    rx = e(f["scale"] * 16.0 * f["aspect"])
    ry = e(f["scale"] * 16.0) / e(f["aspect"])
    cx, cy = e(f["cx"]), e(f["cy"])
    dx, dy = _X - cx, _Y - cy

    face = (dx / rx) ** 2 + (dy / ry) ** 2 <= 1.0
    outer = (dx / (rx * 1.12)) ** 2 + (dy / (ry * 1.12)) ** 2 <= 1.0
    hairline = cy - ry * (1.0 - 2.0 * e(f["fringe"]))
    hair = outer & ((_Y < hairline) | ~face)

    ex = e(f["eye_sep"]) * rx
    ey = cy - 0.18 * ry
    er = e(f["eye_size"]) * e(f["scale"])
    eyes = (((dx - ex) ** 2 + (_Y - ey) ** 2 <= er ** 2) |
            ((dx + ex) ** 2 + (_Y - ey) ** 2 <= er ** 2)) & face

    # mouth: a parabolic band. smile bends the band's centerline.
    mw = e(f["mouth_w"]) * rx
    xm = np.clip(dx / np.maximum(mw, 1e-3), -1.2, 1.2)
    y_mouth = cy + 0.52 * ry - e(f["smile"]) * 0.18 * ry * (xm ** 2 - 0.5)
    mouth = (np.abs(dx) <= mw) & (np.abs(_Y - y_mouth) <= 1.3) & face

    nose = (np.abs(dx) <= 0.9) & (np.abs(_Y - (cy + 0.12 * ry)) <= 0.12 * ry)

    bg = _hue_rgb(f["bg_hue"])[:, None, None, :]
    skin = _skin_rgb(f["skin"])[:, None, None, :]
    hair_c = _hue_rgb(f["hair_hue"], sat=0.8, val=0.45)[:, None, None, :]
    dark = np.array([0.08, 0.07, 0.10], np.float32)
    red = np.array([0.55, 0.15, 0.18], np.float32)

    img = np.broadcast_to(bg, (B, H, H, 3)).copy()
    for mask, color in ((hair, hair_c), (face & ~hair, skin)):
        m = mask[..., None]
        img = np.where(m, np.broadcast_to(color, img.shape), img)
    img = np.where(nose[..., None], img * 0.82, img)
    img = np.where(eyes[..., None], dark, img)
    img = np.where(mouth[..., None], red, img)
    return np.clip(img * 255.0 + 0.5, 0, 255).astype(np.uint8)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--root", default=os.path.join("data", "celeba"))
    parser.add_argument("--n", type=int, default=N_REF)
    parser.add_argument("--chunk", type=int, default=1024)
    args = parser.parse_args(argv)

    os.makedirs(args.root, exist_ok=True)
    path = os.path.join(args.root, "celeba_64.npy")
    out = open_memmap(path, mode="w+", dtype=np.uint8,
                      shape=(args.n, H, H, 3))
    rng = np.random.default_rng(0)
    for lo in range(0, args.n, args.chunk):
        hi = min(args.n, lo + args.chunk)
        f = sample_factors(rng, hi - lo)
        out[lo:hi] = render_faces(f)
    out.flush()
    print("wrote {} ({} imgs)".format(path, args.n))


if __name__ == "__main__":
    main()
