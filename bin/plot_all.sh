#!/usr/bin/env bash
# Render the README-style plot/gif family for all trained models
# (reference bin/plot_all.sh): cherry-picked sample indices, per-model
# gif-traversals, the grid-of-gifs, and the static plot set.
# Sequential by default (one TPU chip per process); PARALLEL=1 to fan out.
#
# Parameterizable so a partial model zoo can be rendered (e.g. the on-chip
# evidence dirs, which carry a _tpu suffix):
#   PLOT_LOSSES    losses to render        (default: factor btcvae betaB betaH VAE)
#   PLOT_DATASETS  datasets to render      (default: celeba chairs mnist dsprites)
#   PLOT_SUFFIX    run-dir suffix, e.g. _tpu (default: empty)
#   PLOT_SECTIONS  which sections: "grid", "all", or both (default: grid all)
#   PLOT_COOLDOWN  seconds to sleep between sequential TPU processes
#                  (default 0; use >=300 on the tunneled chip — verify skill)

set -u
logger="plot_all.out"
echo "STARTING" > "$logger"

losses="${PLOT_LOSSES:-factor btcvae betaB betaH VAE}"
datasets="${PLOT_DATASETS:-celeba chairs mnist dsprites}"
suffix="${PLOT_SUFFIX:-}"
sections="${PLOT_SECTIONS:-grid all}"
cool="${PLOT_COOLDOWN:-0}"

run() {
    if [ "${PARALLEL:-0}" = "1" ]; then "$@" & else "$@"; sleep "$cool"; fi
}

wants() { case " $datasets " in *" $1 "*) return 0;; *) return 1;; esac; }
section() { case " $sections " in *" $1 "*) return 0;; *) return 1;; esac; }

# cherry-picked indices comparable with prior work (see reference
# bin/plot_all.sh): every dsprites shape, ordered mnist digits, etc.
cherry_celeba_idcs="88413 176606 179144 32260 191281 143307 101535 70059 87889 131612"
cherry_mnist_idcs="1 40 25 7 92 41001 90 41002 823 41219"
cherry_dsprites_idcs="92595 339150 656090"
cherry_chairs_idcs="40919 5172 22330"

if section grid; then
    echo "### GIF GRID ###" >> "$logger"
    kwargs="-s 1234 -c 3 -r 5 -t 2"
    for loss in $losses; do
        echo "" >> "$logger"; echo "$loss" >> "$logger"
        ! wants celeba || run python main_viz.py "${loss}_celeba${suffix}" gif-traversals -i $cherry_celeba_idcs $kwargs
        ! wants chairs || run python main_viz.py "${loss}_chairs${suffix}" gif-traversals -i $cherry_chairs_idcs $kwargs
        ! wants mnist || run python main_viz.py "${loss}_mnist${suffix}" gif-traversals -u 2 -i $cherry_mnist_idcs $kwargs
        ! wants dsprites || run python main_viz.py "${loss}_dsprites${suffix}" gif-traversals -i $cherry_dsprites_idcs $kwargs
        wait
    done

    python - <<'END'
import os
from disvae_tpu.utils.viz_helpers import plot_grid_gifs
losses = os.environ.get("PLOT_LOSSES", "VAE betaH betaB factor btcvae").split()
datasets = os.environ.get("PLOT_DATASETS",
                          "dsprites celeba chairs mnist").split()
suffix = os.environ.get("PLOT_SUFFIX", "")
grid_files = [["results/{}_{}{}/posterior_traversals.gif"
               .format(loss, data, suffix) for data in datasets]
              for loss in losses]
plot_grid_gifs("results/grid_posteriors.gif", grid_files)
END
fi

if section all; then
    echo "### ALL PLOTS ###" >> "$logger"
    kwargs="-s 1234 -c 7 -r 7 -t 2"
    for loss in $losses; do
        echo "" >> "$logger"; echo "$loss" >> "$logger"
        ! wants celeba || run python main_viz.py "${loss}_celeba${suffix}" all -i $cherry_celeba_idcs $kwargs
        ! wants chairs || run python main_viz.py "${loss}_chairs${suffix}" all -i $cherry_chairs_idcs $kwargs
        ! wants mnist || run python main_viz.py "${loss}_mnist${suffix}" all -u 2 -i $cherry_mnist_idcs $kwargs
        ! wants dsprites || run python main_viz.py "${loss}_dsprites${suffix}" all -i $cherry_dsprites_idcs $kwargs
        wait
    done
fi
