#!/usr/bin/env bash
# Drive a COMPLETE on-chip evidence set for one predefined experiment
# through the production CLIs, then snapshot it into artifacts/<name>/:
#
#   1. train (+ test-loss eval)        -> train_losses.log, test_losses.log,
#                                         training.gif, model.npz, specs.json
#   2. metrics, reference-faithful     -> metrics.reference-faithful.log
#   3. metrics, --corrected-mig        -> metrics.corrected.log
#   4. main_viz all                    -> all 6 plot families incl.
#                                         posterior_traversals.gif
#
# This makes evidence collection mechanical end-to-end (the same theme as
# tools/snapshot_artifacts.sh): one command per run, the tunnel discipline
# (one TPU process at a time, >=5 min cooldown between processes, generous
# timeouts — see .claude/skills/verify/SKILL.md) encoded here instead of
# re-derived per run.
#
# Usage: tools/evidence_run.sh <name> <experiment> [seed]
#   e.g. tools/evidence_run.sh VAE_dsprites_tpu VAE_dsprites 1234
# Env: EVIDENCE_COOLDOWN (s between TPU processes, default 330),
#      EVIDENCE_TIMEOUT (s per CLI invocation, default 2700),
#      EVIDENCE_TRAIN_FLAGS (extra flags for the train leg only, e.g.
#      "--no-viz-gif --precision default" for long throughput-bound runs),
#      EVIDENCE_SKIP_METRICS=1 (datasets without a factor lattice — celeba,
#      chairs, mnist, fashion — cannot run MIG/AAM; skip both metrics legs).
set -euo pipefail
cd "$(dirname "$0")/.."
name=$1
exp=$2
seed=${3:-1234}
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-/root/.jax_cache}"
cool="${EVIDENCE_COOLDOWN:-330}"
cap="${EVIDENCE_TIMEOUT:-2700}"

run() { # <label> <cmd...>
  local label=$1; shift
  echo "== $label ($(date -u +%H:%M:%S)): $*" >&2
  local rc=0
  timeout "$cap" "$@" > "/tmp/${name}.${label}.log" 2>&1 || rc=$?
  if [ "$rc" -ne 0 ]; then
    # rc captured explicitly so the log shows the REAL exit status
    # (124 = timeout vs a CLI crash) — `$?` inside the if-branch of a
    # negated pipeline is always 0.
    echo "FAILED $label (rc=$rc); log tail:" >&2
    tail -20 "/tmp/${name}.${label}.log" >&2
    exit 1
  fi
  echo "== $label done ($(date -u +%H:%M:%S))" >&2
}

# shellcheck disable=SC2086 — EVIDENCE_TRAIN_FLAGS is intentionally word-split
run train python main.py "$name" -x "$exp" --no-progress-bar -s "$seed" \
    ${EVIDENCE_TRAIN_FLAGS:-}
sleep "$cool"
if [ "${EVIDENCE_SKIP_METRICS:-0}" != "1" ]; then
  run metrics-faithful python main.py "$name" -x "$exp" --is-eval-only \
      --is-metrics --no-test --no-progress-bar
  tools/snapshot_artifacts.sh "$name" reference-faithful >&2
  sleep "$cool"
  run metrics-corrected python main.py "$name" -x "$exp" --is-eval-only \
      --is-metrics --no-test --no-progress-bar --corrected-mig
  tools/snapshot_artifacts.sh "$name" corrected >&2
  sleep "$cool"
fi
run viz python main_viz.py "$name" all -s 1
# final exhaustive snapshot; the run dir's metrics.log holds the corrected
# mode at this point (it was the last metrics invocation)
tools/snapshot_artifacts.sh "$name" corrected >&2
echo "evidence set complete: artifacts/$name" >&2
