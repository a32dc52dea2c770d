"""Fabricate full-count MNIST/FashionMNIST caches for zero-egress hosts.

The real datasets (reference utils/datasets.py:355-382) are 60,000
grayscale 28x28 images (resized to 32x32 by our loader cache). This
script renders the same count of class-consistent parametric glyphs so a
VAE trained on the cache actually learns (loss decreases, traversals
interpolate through glyph shapes) rather than pinning at the BCE entropy
floor the way an unlearnable noise cache does:

- mnist: digits 0-9 drawn as seven-segment glyphs with smoothly varying
  position, scale, stroke thickness and brightness (label = digit).
- fashion: 10 parametric garment silhouettes (t-shirt, trouser, pullover,
  dress, coat, sandal, shirt, sneaker, bag, ankle boot) with the same
  varying factors (label = class index, mirroring the real label set).

Writes `data/<name>/train32.npz` with `imgs` uint8 (N, 32, 32, 1) and
`labels` int32 — the cache `disvae_tpu.data.datasets.MNIST`/`FashionMNIST`
read directly. White glyphs on black (both loaders' background_color).

Usage: python tools/fabricate_mnist.py [--dataset mnist|fashion]
                                       [--root data/<name>] [--n 60000]
"""

import argparse
import os

import numpy as np

N_REF = 60000  # train-split count of both real datasets

H = 32

# seven-segment layout: (y0, y1, x0, x1) in a unit glyph box, as fractions
#   A=top, B=top-right, C=bottom-right, D=bottom, E=bottom-left,
#   F=top-left, G=middle
_SEGS = {
    "A": (0.00, 0.15, 0.10, 0.90),
    "B": (0.05, 0.55, 0.80, 1.00),
    "C": (0.45, 0.95, 0.80, 1.00),
    "D": (0.85, 1.00, 0.10, 0.90),
    "E": (0.45, 0.95, 0.00, 0.20),
    "F": (0.05, 0.55, 0.00, 0.20),
    "G": (0.42, 0.58, 0.10, 0.90),
}
_DIGIT_SEGS = {
    0: "ABCDEF", 1: "BC", 2: "ABGED", 3: "ABGCD", 4: "FGBC",
    5: "AFGCD", 6: "AFGECD", 7: "ABC", 8: "ABCDEFG", 9: "ABCDFG",
}


def _rect(out, y0, y1, x0, x1, shade):
    y0, y1 = max(0, int(round(y0))), min(H, int(round(y1)))
    x0, x1 = max(0, int(round(x0))), min(H, int(round(x1)))
    if y0 < y1 and x0 < x1:
        out[y0:y1, x0:x1] = shade


def render_digit(out, digit, cx, cy, scale, thick, shade):
    """Seven-segment digit; box is 10*scale wide, 18*scale tall, centered
    at (cx, cy); `thick` in (0, 1] fattens strokes toward the box center."""
    w, h = 10.0 * scale, 18.0 * scale
    ox, oy = cx - w / 2.0, cy - h / 2.0
    grow = 2.0 * thick * scale
    for seg in _DIGIT_SEGS[digit]:
        fy0, fy1, fx0, fx1 = _SEGS[seg]
        y0, y1 = oy + fy0 * h, oy + fy1 * h
        x0, x1 = ox + fx0 * w, ox + fx1 * w
        # fatten thin strokes symmetrically so thickness is a real factor
        if y1 - y0 < x1 - x0:
            y0, y1 = y0 - grow / 2, y1 + grow / 2
        else:
            x0, x1 = x0 - grow / 2, x1 + grow / 2
        _rect(out, y0, y1, x0, x1, shade)


def render_garment(out, cls, cx, cy, scale, thick, shade):
    """One of 10 parametric garment silhouettes (class order mirrors the
    real FashionMNIST label names)."""
    s = scale
    body_w, body_h = 12.0 * s, 14.0 * s
    x0, x1 = cx - body_w / 2, cx + body_w / 2
    y0 = cy - body_h / 2
    slv = 3.0 * s * (0.7 + thick)            # sleeve width
    if cls == 0:    # t-shirt: torso + short sleeves
        _rect(out, y0, y0 + body_h, x0, x1, shade)
        _rect(out, y0, y0 + 5 * s, x0 - slv, x1 + slv, shade)
    elif cls == 1:  # trouser: waistband + two legs
        _rect(out, y0, y0 + 3 * s, x0, x1, shade)
        leg = 4.0 * s
        _rect(out, y0, y0 + 16 * s, x0, x0 + leg, shade)
        _rect(out, y0, y0 + 16 * s, x1 - leg, x1, shade)
    elif cls == 2:  # pullover: torso + full-length sleeves
        _rect(out, y0, y0 + body_h, x0, x1, shade)
        _rect(out, y0, y0 + body_h, x0 - slv, x0, shade)
        _rect(out, y0, y0 + body_h, x1, x1 + slv, shade)
    elif cls == 3:  # dress: flaring trapezoid
        rows = int(round(16 * s))
        for i in range(rows):
            half = (3.0 + 4.0 * i / max(1, rows - 1)) * s
            _rect(out, y0 + i, y0 + i + 1, cx - half, cx + half, shade)
    elif cls == 4:  # coat: long torso + sleeves + dark center placket
        _rect(out, y0, y0 + 17 * s, x0, x1, shade)
        _rect(out, y0, y0 + 12 * s, x0 - slv, x0, shade)
        _rect(out, y0, y0 + 12 * s, x1, x1 + slv, shade)
        _rect(out, y0, y0 + 17 * s, cx - 0.6 * s, cx + 0.6 * s, shade * 0.4)
    elif cls == 5:  # sandal: sole + two straps
        _rect(out, cy + 3 * s, cy + 5 * s, x0 - 2 * s, x1 + 2 * s, shade)
        _rect(out, cy - 2 * s, cy + 3 * s, cx - 5 * s, cx - 3.5 * s, shade)
        _rect(out, cy - 2 * s, cy + 3 * s, cx + 2 * s, cx + 3.5 * s, shade)
    elif cls == 6:  # shirt: torso + sleeves + dark collar notch
        _rect(out, y0, y0 + body_h, x0, x1, shade)
        _rect(out, y0, y0 + 8 * s, x0 - slv, x0, shade)
        _rect(out, y0, y0 + 8 * s, x1, x1 + slv, shade)
        _rect(out, y0, y0 + 3 * s, cx - 1.5 * s, cx + 1.5 * s, shade * 0.3)
    elif cls == 7:  # sneaker: sole + low toe box
        _rect(out, cy + 2 * s, cy + 5 * s, x0 - 2 * s, x1 + 3 * s, shade)
        _rect(out, cy - 2 * s, cy + 2 * s, x0 - 2 * s, cx + 2 * s, shade)
    elif cls == 8:  # bag: box + handle arch
        _rect(out, cy - 2 * s, cy + 6 * s, x0, x1, shade)
        _rect(out, cy - 6 * s, cy - 4.5 * s, cx - 4 * s, cx + 4 * s, shade)
        _rect(out, cy - 6 * s, cy - 2 * s, cx - 4 * s, cx - 2.5 * s, shade)
        _rect(out, cy - 6 * s, cy - 2 * s, cx + 2.5 * s, cx + 4 * s, shade)
    else:           # ankle boot: shaft + foot
        _rect(out, cy - 6 * s, cy + 5 * s, x0, cx, shade)
        _rect(out, cy + 1 * s, cy + 5 * s, x0, x1 + 3 * s, shade)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", choices=("mnist", "fashion"),
                        default="mnist")
    parser.add_argument("--root", default=None)
    parser.add_argument("--n", type=int, default=N_REF)
    args = parser.parse_args(argv)

    root = args.root or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "data", args.dataset)
    os.makedirs(root, exist_ok=True)

    rng = np.random.RandomState(0 if args.dataset == "mnist" else 1)
    labels = (np.arange(args.n) % 10).astype(np.int32)
    rng.shuffle(labels)
    cxs = rng.uniform(12, 20, args.n)
    cys = rng.uniform(13, 19, args.n)
    scales = rng.uniform(0.8, 1.4, args.n)
    thicks = rng.uniform(0.2, 1.0, args.n)
    shades = rng.uniform(0.55, 1.0, args.n)   # white-ish glyph on black

    render = render_digit if args.dataset == "mnist" else render_garment
    imgs = np.zeros((args.n, 32, 32, 1), np.uint8)
    canvas = np.empty((32, 32), np.float32)
    for i in range(args.n):
        canvas[:] = 0.0  # black background (MNIST.background_color)
        render(canvas, int(labels[i]), float(cxs[i]), float(cys[i]),
               float(scales[i]), float(thicks[i]), float(shades[i]))
        imgs[i, :, :, 0] = np.round(canvas * 255).astype(np.uint8)
        if i % 20000 == 0:
            print("  {} / {}".format(i, args.n), flush=True)

    # atomic, like the loader's own cache build (datasets.py:402-405)
    cache = os.path.join(root, "train32.npz")
    tmp = cache + ".tmp.npz"
    np.savez_compressed(tmp, imgs=imgs, labels=labels)
    os.replace(tmp, cache)
    print("wrote {} ({} images)".format(cache, args.n))


if __name__ == "__main__":
    main()
