#!/usr/bin/env bash
# Train every loss x dataset combination plus the two "best_*" experiments
# (reference bin/train_all.sh). Unlike the reference's shell-level `&`
# fan-out, runs are SEQUENTIAL by default: a TPU chip is held by one process
# at a time. Set PARALLEL=1 to fan out (multi-host / CPU).

set -u
logger="train_all.out"
echo "STARTING" > "$logger"

run() {
    if [ "${PARALLEL:-0}" = "1" ]; then "$@" & else "$@"; fi
}

for loss in VAE betaH betaB factor btcvae; do
    echo "" >> "$logger"; echo "$loss" >> "$logger"
    for dataset in dsprites celeba chairs mnist; do
        echo "$dataset" >> "$logger"
        run python main.py "${loss}_${dataset}" -x "${loss}_${dataset}" --no-progress-bar
    done
    wait
done

echo "best_celeba" >> "$logger"
run python main.py best_celeba -x best_celeba --no-progress-bar

echo "best_dsprites" >> "$logger"
python main.py best_dsprites -x best_dsprites --no-progress-bar
wait
