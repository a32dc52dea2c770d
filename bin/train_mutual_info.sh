#!/usr/bin/env bash
# btcvae alpha-sweep on dsprites/celeba (reference bin/train_mutual_info.sh).
# Sequential by default (one TPU chip per process); PARALLEL=1 to fan out.

set -u
run() {
    if [ "${PARALLEL:-0}" = "1" ]; then "$@" & else "$@"; fi
}

loss="btcvae"
for dataset in dsprites celeba; do
    for alpha in -5 -1 0 1 5; do
        run python main.py "${loss}_${dataset}_a${alpha}" -x "${loss}_${dataset}" \
            --btcvae-A "$alpha" --no-progress-bar
    done
done
wait
