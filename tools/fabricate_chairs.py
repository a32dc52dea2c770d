"""Fabricate a Chairs-compatible cache for zero-egress hosts.

The real dataset (reference utils/datasets.py:294-352) is 86,366 grayscale
64x64 renders of 3D chairs on a white background. This script renders the
same count of simple parametric chair silhouettes — seat + backrest + legs
with smoothly varying position, scale, "viewpoint" (seat aspect / leg
splay) and shade — so a VAE trained on the cache actually learns (loss
decreases, traversals move through chair-like shapes) rather than pinning
at the BCE entropy floor the way an unlearnable noise cache does.

Writes `data/chairs/chairs_64.npy` (uint8, (N, 64, 64, 1) memmap), the
cache `disvae_tpu.data.datasets.Chairs` reads directly.

Usage: python tools/fabricate_chairs.py [--root data/chairs] [--n 86366]
"""

import argparse
import os

import numpy as np
from numpy.lib.format import open_memmap

N_REF = 86366  # len(rendered_chairs/**/*.png) in the real dataset


def render_chair(out, cx, cy, scale, aspect, splay, shade):
    """Draw one chair silhouette into `out` (64x64 f32 canvas of 1.0 =
    white). All geometry in pixels, clipped to the canvas."""
    h = 64
    seat_w = int(round(14 * scale * aspect))
    seat_t = max(2, int(round(3 * scale)))
    back_h = int(round(16 * scale))
    back_t = max(2, int(round(3 * scale)))
    leg_h = int(round(12 * scale))
    leg_t = max(1, int(round(2 * scale)))

    def rect(y0, y1, x0, x1):
        y0, y1 = max(0, y0), min(h, y1)
        x0, x1 = max(0, x0), min(h, x1)
        if y0 < y1 and x0 < x1:
            out[y0:y1, x0:x1] = shade

    seat_y = cy
    x0 = cx - seat_w // 2
    x1 = cx + seat_w // 2
    rect(seat_y, seat_y + seat_t, x0, x1)          # seat
    rect(seat_y - back_h, seat_y, x0, x0 + back_t)  # backrest (left side)
    # legs: front/back pairs, splayed outward by `splay` px at the feet
    for lx, s in ((x0, -splay), (x1 - leg_t, splay)):
        for i in range(leg_h):
            off = int(round(s * i / max(1, leg_h - 1)))
            y = seat_y + seat_t + i
            if 0 <= y < h:
                a, b = max(0, lx + off), min(h, lx + off + leg_t)
                if a < b:
                    out[y, a:b] = shade


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--root", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "data", "chairs"))
    parser.add_argument("--n", type=int, default=N_REF)
    args = parser.parse_args(argv)

    os.makedirs(args.root, exist_ok=True)
    path = os.path.join(args.root, "chairs_64.npy")
    mm = open_memmap(path, mode="w+", dtype=np.uint8,
                     shape=(args.n, 64, 64, 1))
    rng = np.random.RandomState(0)
    # smooth independent factors, like the real dataset's (chair model,
    # azimuth, elevation) grid
    cxs = rng.randint(20, 45, args.n)
    cys = rng.randint(24, 40, args.n)
    scales = rng.uniform(0.8, 1.8, args.n)
    aspects = rng.uniform(0.7, 1.4, args.n)      # "azimuth" proxy
    splays = rng.uniform(0.0, 4.0, args.n)       # "elevation" proxy
    shades = rng.uniform(0.05, 0.45, args.n)     # render shading
    canvas = np.empty((64, 64), np.float32)
    for i in range(args.n):
        canvas[:] = 1.0  # white background (Chairs.background_color)
        render_chair(canvas, int(cxs[i]), int(cys[i]), float(scales[i]),
                     float(aspects[i]), float(splays[i]), float(shades[i]))
        mm[i, :, :, 0] = np.round(canvas * 255).astype(np.uint8)
        if i % 20000 == 0:
            print("  {} / {}".format(i, args.n), flush=True)
    mm.flush()
    print("wrote {} ({} images)".format(path, args.n))


if __name__ == "__main__":
    main()
