#!/usr/bin/env bash
# Chain the 10k BASELINE config across device-tunnel failures.
#
# The remote TPU link can collapse mid-run (bulk transfers hang while
# control RPCs still answer — see .claude/skills/verify/SKILL.md), so a
# single 10k execution cannot be trusted to finish in one process. This
# driver relaunches bench_e2e with BENCH_E2E_CHECKPOINT so every attempt
# resumes from the last completed state (plus the mid-IP sidecar), and
# bounds each attempt with `timeout` rather than killing mid-dispatch.
#
# Usage: tools/run_10k_chained.sh [attempts] [per-attempt-timeout-s]
set -uo pipefail
cd "$(dirname "$0")/.."

ATTEMPTS="${1:-10}"
WINDOW="${2:-3600}"
OUT=.bench_out
mkdir -p "$OUT"
LOG="$OUT/bench10k.log"
JSON="$OUT/bench10k.json"

for i in $(seq 1 "$ATTEMPTS"); do
  echo "=== attempt $i/$ATTEMPTS $(date -u +%H:%M:%S) ===" | tee -a "$LOG"
  BENCH_E2E_ORTHO="$OUT/ortho10k" \
  BENCH_E2E_CHECKPOINT="$OUT/ckpt10k" \
  BENCH_E2E_BATCH=256 \
    timeout "$WINDOW" python bench_e2e.py 10044 >> "$JSON" 2>> "$LOG"
  rc=$?
  echo "=== attempt $i exit=$rc ===" | tee -a "$LOG"
  if [ $rc -eq 0 ] && grep -q '"final_state": "COMPLETE"' "$JSON"; then
    echo "=== COMPLETE after $i attempts ===" | tee -a "$LOG"
    break
  fi
  # brief backoff: a wedged relay sometimes recovers between sessions
  sleep 30
done
