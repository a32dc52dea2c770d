#!/usr/bin/env bash
# Complete the reference model zoo on chip: the reference ships trained
# results for all 20 base configs (5 losses x 4 datasets —
# /root/reference/results/{VAE,betaH,betaB,factor,btcvae}_{mnist,dsprites,
# celeba,chairs}). Rounds 1-5 evidenced 9 of the 20 at full reference
# length; this driver runs the remaining 11 through tools/evidence_run.sh
# (train + eval + viz-all, learnable fabricated caches, tunnel discipline)
# so every reference zoo config has an artifacts/<config>*_tpu counterpart.
#
# Grouped by dataset so each group shares compiled-program shapes; factor
# runs (dual-optimizer, doubled batch) go last in each group.
#
# Usage: tools/complete_zoo.sh [group ...]   (default: mnist chairs celeba)
set -uo pipefail
cd "$(dirname "$0")/.."
export EVIDENCE_SKIP_METRICS=1           # no factor lattice on these datasets
export EVIDENCE_TRAIN_FLAGS="--no-viz-gif --precision default"
cool="${EVIDENCE_COOLDOWN:-330}"

declare -A GROUPS_RUNS=(
  [mnist]="betaH_mnist_tpu:betaH_mnist betaB_mnist_tpu:betaB_mnist btcvae_mnist_tpu:btcvae_mnist factor_mnist_full_tpu:factor_mnist"
  [chairs]="VAE_chairs_tpu:VAE_chairs betaH_chairs_tpu:betaH_chairs factor_chairs_tpu:factor_chairs"
  [celeba]="VAE_celeba_tpu:VAE_celeba betaH_celeba_tpu:betaH_celeba betaB_celeba_tpu:betaB_celeba factor_celeba_tpu:factor_celeba"
)

groups=("$@")
[ "${#groups[@]}" -eq 0 ] && groups=(mnist chairs celeba)
first=1
for group in "${groups[@]}"; do
  for pair in ${GROUPS_RUNS[$group]}; do
    name="${pair%%:*}"; exp="${pair##*:}"
    if [ -f "artifacts/$name/train_losses.log" ]; then
      echo "== skip $name (already snapshotted)" >&2
      continue
    fi
    if [ "$first" -eq 0 ]; then
      echo "== inter-run cooldown ${cool}s ($(date -u +%H:%M:%S))" >&2
      sleep "$cool"
    fi
    first=0
    echo "==== ZOO RUN $name  (-x $exp)  $(date -u +%H:%M:%S) ====" >&2
    if ! tools/evidence_run.sh "$name" "$exp"; then
      echo "==== ZOO RUN $name FAILED — aborting so the tunnel state is inspectable ====" >&2
      exit 1
    fi
    echo "==== ZOO RUN $name complete $(date -u +%H:%M:%S) ====" >&2
  done
done
echo "zoo complete" >&2
