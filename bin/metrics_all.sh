#!/usr/bin/env bash
# MIG/AAM metrics for every loss on dsprites (the only dataset with known
# factors) — reference bin/metrics_all.sh. Sequential by default.

set -u
logger="metrics_all.out"
echo "STARTING" > "$logger"

run() {
    if [ "${PARALLEL:-0}" = "1" ]; then "$@" & else "$@"; fi
}

for dataset in dsprites; do
    for loss in btcvae betaH betaB factor VAE; do
        echo "" >> "$logger"; echo "$loss" >> "$logger"
        run python main.py "${loss}_${dataset}" -x "${loss}_${dataset}" \
            --is-metrics --is-eval-only --no-test --no-progress-bar
    done
    wait
done
