#!/bin/bash
# TPU recovery watcher + round-4 measurement harvest.
#
# The axon tunnel has been hard-wedged since round 3 (any backend contact
# hangs; reproduced by the round-3 judge). All round-4 measurement code is
# landed and CPU-smoked; only on-chip numbers are missing. This script
# probes the backend in fresh disposable subprocesses (a wedged backend is
# per-process state — same rationale as bench.py's orchestration) and, the
# moment a probe answers, runs the full measurement queue with per-leg
# timeouts and logs under docs/harvest_r4/.
#
# Queue (VERDICT r3 "Next round" items 1, 3, 4, 5, 6):
#   bench    — wedge-proof driver bench end-to-end (tokenizer + Pallas gate
#              + flagship steps/s + get_action + batch-16 infer + loader)
#   mfu_r4   — grouped-conv packed trunk + recorded-argmax pool backward
#              experiments -> docs/mfu_campaign_r4.json
#   steady   — measured end-to-end steady state (real loader -> device)
#   quality  — 400-step training-quality run -> docs/training_quality_r4.json
#   donate   — flagship bench with RMVQ_DONATE=1 buffer donation
#
# Exit codes: 0 = full harvest done; 2 = backend re-wedged mid-harvest
# (partial results preserved). Runs forever while wedged (PROBE_EVERY
# seconds between probes) unless HARVEST_MAX_WAIT_S is set.

set -u
# REPO_ROOT override lets the operator run a /tmp COPY of this script (bash
# reads scripts incrementally, so editing the in-repo file mid-run would
# corrupt a long-running instance launched from the repo path).
cd "${REPO_ROOT:-$(dirname "$0")/..}"
OUT=docs/harvest_r4
mkdir -p "$OUT"
LOG="$OUT/harvest.log"

note() { echo "[harvest] $* $(date -u +%FT%TZ)" | tee -a "$LOG"; }

probe() { # probe <timeout_s> — fresh python each attempt. Requires a
  # NON-CPU backend: if the axon plugin ever fails fast instead of hanging
  # and jax falls back to CPU, declaring TPU_ALIVE here would run the full
  # multi-hour harvest recording CPU numbers as on-chip results.
  timeout "${1:-90}" python -c \
    "import jax; assert jax.default_backend() != 'cpu'; jax.devices()" \
    >/dev/null 2>&1
}

PROBE_EVERY=${PROBE_EVERY:-300}
START=$(date +%s)
note "watcher start (probe every ${PROBE_EVERY}s)"
until probe 90; do
  note "still wedged"
  if [ -n "${HARVEST_MAX_WAIT_S:-}" ] && \
     [ $(( $(date +%s) - START )) -gt "$HARVEST_MAX_WAIT_S" ]; then
    note "gave up waiting after ${HARVEST_MAX_WAIT_S}s"
    exit 3
  fi
  sleep "$PROBE_EVERY"
done
note "TPU_ALIVE — starting harvest"

FAILED_LEGS=""

run_leg() { # run_leg <name> <timeout_s> <cmd...>
  local name=$1 t=$2 rc
  shift 2
  if ! probe 60; then
    note "leg $name SKIPPED — backend re-wedged; partial harvest preserved"
    exit 2
  fi
  note "leg $name start (timeout ${t}s)"
  timeout "$t" "$@" > "$OUT/$name.log" 2>&1
  rc=$?
  note "leg $name rc=$rc"
  [ "$rc" -ne 0 ] && FAILED_LEGS="$FAILED_LEGS $name(rc=$rc)"
}

run_leg bench   650  python bench.py
# packed_step is the adoption-decision number for packed_rgb_encoders
# (full-train-step delta); packed_trunk is its trunk-isolated diagnostic.
run_leg mfu_r4  3600 python -m robot_manipulation_vq_vae_tpu.scripts.mfu_campaign \
                       --exps packed_trunk,packed_step,pool_argmax \
                       --out docs/mfu_campaign_r4.json
run_leg steady  1800 env RMVQ_SMOKE_STEADY=1 \
                     python -m robot_manipulation_vq_vae_tpu.scripts.flagship_smoke
run_leg quality 3600 python -m robot_manipulation_vq_vae_tpu.scripts.training_quality_run
run_leg donate  900  env RMVQ_DONATE=1 RMVQ_BF16=1 python bench_train.py
# batch-128 scaling probe: default-semantics lever (batch size is a user
# knob); larger per-step batches amortize the stem's launch overhead and
# may lift samples/s past the batch-64 number. An OOM here is a finding,
# not a failure (the leg log records it).
run_leg batch128 900 env RMVQ_BF16=1 RMVQ_BATCH=128 python bench_train.py

if [ -n "$FAILED_LEGS" ]; then
  note "DONE WITH FAILURES:$FAILED_LEGS"
  exit 1
fi
note "DONE — full harvest complete"
