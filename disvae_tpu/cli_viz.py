"""Render plots from a pretrained `results/<name>/` directory.

Implementation of the repo-root `main_viz.py` launcher (shipped as
`disvae_tpu.cli_viz`; the root file is a thin reference-parity shim).
CLI-compatible with the reference's main_viz.py:16-107 (same plot names and
flags). Works on our `model.npz` checkpoints AND directly on the reference's
torch `model.pt` result dirs via the transparent converter in modelIO.
"""

import argparse
import os
import sys

from disvae_tpu.utils.helpers import (FormatterNoDuplicate, check_bounds,
                                      set_seed)
from disvae_tpu.utils.modelIO import load_metadata, load_model
from disvae_tpu.utils.visualize import Visualizer
from disvae_tpu.utils.viz_helpers import get_samples
from disvae_tpu.cli import RES_DIR

PLOT_TYPES = ['generate-samples', 'data-samples', 'reconstruct', "traversals",
              'reconstruct-traverse', "gif-traversals", "all"]


def parse_arguments(args_to_parse):
    description = "CLI for plotting using pretrained models of `disvae`"
    parser = argparse.ArgumentParser(description=description,
                                     formatter_class=FormatterNoDuplicate)

    parser.add_argument('name', type=str,
                        help="Run whose results/<name>/ directory holds the trained model.")
    parser.add_argument("plots", type=str, nargs='+', choices=PLOT_TYPES,
                        help="Plots to render. `generate-samples`: decode "
                             "draws from the prior. `data-samples`: show raw "
                             "dataset images. `reconstruct`: originals on the "
                             "top half, their reconstructions below. "
                             "`traversals`: one row per (KL-ranked) latent "
                             "dimension, swept across ncols values. "
                             "`reconstruct-traverse`: originals, then "
                             "reconstructions, then the traversal rows. "
                             "`gif-traversals`: animated per-image posterior "
                             "sweeps arranged in a grid. `all`: everything.")
    parser.add_argument('-s', '--seed', type=int, default=None,
                        help='Base PRNG seed; `None` draws from the clock.')
    parser.add_argument('-r', '--n-rows', type=int, default=6,
                        help='Grid rows (where the plot is a grid).')
    parser.add_argument('-c', '--n-cols', type=int, default=7,
                        help='Grid columns (where the plot is a grid).')
    parser.add_argument('-t', '--max-traversal', default=2,
                        type=lambda v: check_bounds(v, lb=0, is_inclusive=False,
                                                    type=float,
                                                    name="max-traversal"),
                        help='Half-width of each (symmetric) latent sweep: an '
                             'absolute offset when >= 0.5, otherwise a '
                             'Gaussian quantile.')
    parser.add_argument('-i', '--idcs', type=int, nargs='+', default=[],
                        help='Dataset indices pinned to the front of the '
                             'sample batch.')
    parser.add_argument('-u', '--upsample-factor', default=1,
                        type=lambda v: check_bounds(v, lb=1, is_inclusive=True,
                                                    type=int,
                                                    name="upsample-factor"),
                        help='Integer pixel-replication factor applied before '
                             'grid assembly.')
    parser.add_argument('--is-show-loss', action='store_true',
                        help='Annotate rows with their per-dimension KL.')
    parser.add_argument('--is-posterior', action='store_true',
                        help='Sweep around an encoded image instead of the prior mean.')
    return parser.parse_args(args_to_parse)


def main(args):
    set_seed(args.seed)
    model_dir = os.path.join(RES_DIR, args.name)
    meta_data = load_metadata(model_dir)
    model, params = load_model(model_dir)
    dataset = meta_data['dataset']
    viz = Visualizer(model=model, params=params,
                     model_dir=model_dir,
                     dataset=dataset,
                     max_traversal=args.max_traversal,
                     loss_of_interest='kl_loss_',
                     upsample_factor=args.upsample_factor)
    size = (args.n_rows, args.n_cols)
    num_samples = args.n_cols * args.n_rows
    samples = get_samples(dataset, num_samples, idcs=args.idcs)

    if "all" in args.plots:
        args.plots = [p for p in PLOT_TYPES if p != "all"]

    # one thunk per plot type; kwargs per the Visualizer method contracts
    # (traversals takes ONE image — hence samples[0:1] — and only in
    # posterior mode, matching the reference dispatch semantics)
    dispatch = {
        'generate-samples': lambda: viz.generate_samples(size=size),
        'data-samples': lambda: viz.data_samples(samples, size=size),
        'reconstruct': lambda: viz.reconstruct(samples, size=size),
        'traversals': lambda: viz.traversals(
            data=samples[0:1] if args.is_posterior else None,
            n_per_latent=args.n_cols, n_latents=args.n_rows,
            is_reorder_latents=True),
        'reconstruct-traverse': lambda: viz.reconstruct_traverse(
            samples, is_posterior=args.is_posterior, n_latents=args.n_rows,
            n_per_latent=args.n_cols, is_show_text=args.is_show_loss),
        'gif-traversals': lambda: viz.gif_traversals(
            samples[:args.n_cols], n_latents=args.n_rows),
    }
    for plot_type in args.plots:
        try:
            render = dispatch[plot_type]
        except KeyError:
            raise ValueError("Unrecognized plot_type={}".format(plot_type))
        render()


def cli():
    """Console-script entry point (`disvae-tpu-viz`, pyproject.toml)."""
    main(parse_arguments(sys.argv[1:]))


if __name__ == '__main__':
    cli()
