#!/usr/bin/env bash
# btcvae alpha-sweep on dsprites/celeba (reference bin/train_mutual_info.sh;
# the reference's shipped btcvae_*_a* results dirs come from this matrix).
# Sequential by default (one TPU chip per process); PARALLEL=1 to fan out.
#
# Sweep knobs (defaults reproduce the reference sweep exactly):
#   MI_DATASETS="dsprites"   restrict the dataset loop
#   MI_ALPHAS="-10 0 5"      restrict the alpha loop
#   MI_PRECISION=default     pass --precision (NOT an INI key, so it
#                            survives the experiment overlay; epochs/batch
#                            cannot be shortened from the CLI because the
#                            INI layering deliberately wins - reference
#                            main.py:146-161)

set -u
run() {
    if [ "${PARALLEL:-0}" = "1" ]; then "$@" & else "$@"; fi
}

loss="btcvae"
datasets="${MI_DATASETS:-dsprites celeba}"
alphas="${MI_ALPHAS:--5 -1 0 1 5}"
precision="${MI_PRECISION:-highest}"
for dataset in $datasets; do
    for alpha in $alphas; do
        run python main.py "${loss}_${dataset}_a${alpha}" -x "${loss}_${dataset}" \
            --btcvae-A "$alpha" --no-progress-bar --precision "${precision}"
    done
done
wait
