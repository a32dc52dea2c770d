#!/usr/bin/env bash
# Render the README-style plot/gif family for all trained models
# (reference bin/plot_all.sh): cherry-picked sample indices, per-model
# gif-traversals, the grid-of-gifs, and the static plot set.
# Sequential by default (one TPU chip per process); PARALLEL=1 to fan out.

set -u
logger="plot_all.out"
echo "STARTING" > "$logger"

run() {
    if [ "${PARALLEL:-0}" = "1" ]; then "$@" & else "$@"; fi
}

# cherry-picked indices comparable with prior work (see reference
# bin/plot_all.sh): every dsprites shape, ordered mnist digits, etc.
cherry_celeba_idcs="88413 176606 179144 32260 191281 143307 101535 70059 87889 131612"
cherry_mnist_idcs="1 40 25 7 92 41001 90 41002 823 41219"
cherry_dsprites_idcs="92595 339150 656090"
cherry_chairs_idcs="40919 5172 22330"

echo "### GIF GRID ###" >> "$logger"
kwargs="-s 1234 -c 3 -r 5 -t 2"
for loss in factor btcvae betaB betaH VAE; do
    echo "" >> "$logger"; echo "$loss" >> "$logger"
    run python main_viz.py "${loss}_celeba" gif-traversals -i $cherry_celeba_idcs $kwargs
    run python main_viz.py "${loss}_chairs" gif-traversals -i $cherry_chairs_idcs $kwargs
    run python main_viz.py "${loss}_mnist" gif-traversals -u 2 -i $cherry_mnist_idcs $kwargs
    run python main_viz.py "${loss}_dsprites" gif-traversals -i $cherry_dsprites_idcs $kwargs
    wait
done

python - <<'END'
from disvae_tpu.utils.viz_helpers import plot_grid_gifs
grid_files = [["results/{}_{}/posterior_traversals.gif".format(loss, data)
               for data in ["dsprites", "celeba", "chairs", "mnist"]]
              for loss in ["VAE", "betaH", "betaB", "factor", "btcvae"]]
plot_grid_gifs("results/grid_posteriors.gif", grid_files)
END

echo "### ALL PLOTS ###" >> "$logger"
kwargs="-s 1234 -c 7 -r 7 -t 2"
for loss in factor btcvae betaB betaH VAE; do
    echo "" >> "$logger"; echo "$loss" >> "$logger"
    run python main_viz.py "${loss}_celeba" all -i $cherry_celeba_idcs $kwargs
    run python main_viz.py "${loss}_chairs" all -i $cherry_chairs_idcs $kwargs
    run python main_viz.py "${loss}_mnist" all -u 2 -i $cherry_mnist_idcs $kwargs
    run python main_viz.py "${loss}_dsprites" all -i $cherry_dsprites_idcs $kwargs
    wait
done
