#!/usr/bin/env bash
# One-shot round-3 tail queue: wait for the in-flight moe8 capture to
# release the TPU (ONE process at a time — the tunnel misbehaves with
# two), then run the remaining headline captures in priority order:
#   1. large13B — beyond-HBM host-resident (the round's judged
#      deliverable), single pass, no torch baseline (unmeasured mode).
#   2. large32 with MODEGPT_STREAM_ASYNC=on — overlap the 415 s of
#      synchronous flush/fetch measured in the 12:35 capture; reuses
#      that run's audited torch baseline (27357.18 s extrapolated).
# Budgets are wall-deadline-driven: each step gets what is left before
# DEADLINE_EPOCH minus a small reserve, so a long step starves the next
# instead of overrunning the round.
set -u

cd "$(dirname "$0")/.."

MOE_PID="${1:-}"
DEADLINE_EPOCH="${2:?usage: queue_after_moe8.sh <moe8_pid> <deadline_epoch>}"

if [ -n "$MOE_PID" ]; then
  while kill -0 "$MOE_PID" 2>/dev/null; do sleep 30; done
fi
sleep 10  # let the runner write its capture + exit

left() { echo $(( DEADLINE_EPOCH - $(date +%s) )); }

run_capture() {
  local preset="$1" budget="$2"; shift 2
  local out="bench_results/r03/${preset}.json"
  local log="/tmp/bench_r03_${preset}.log"
  echo "=== queue: preset=${preset} budget=${budget}s -> ${out}" >> /tmp/queue_tail.log
  env "$@" MODEGPT_BENCH_PRESET="${preset}" MODEGPT_BENCH_SKIP_WARMUP=1 \
    timeout "${budget}" python bench.py > "${log}" 2>&1
  local rc=$?
  if [ $rc -eq 0 ] && grep -q '"metric"' "${log}"; then
    if grep '"metric"' "${log}" | tail -1 | grep -q '"device_kind": "cpu"'; then
      echo "queue: ${preset} fell back to CPU — not recorded" >> /tmp/queue_tail.log
      return 1
    fi
    grep '"metric"' "${log}" | tail -1 > "${out}"
    echo "queue: captured ${preset}: $(cat "${out}")" >> /tmp/queue_tail.log
  else
    echo "queue: ${preset} FAILED rc=${rc}" >> /tmp/queue_tail.log
    tail -3 "${log}" >> /tmp/queue_tail.log
  fi
  return $rc
}

B=$(left)
if [ "$B" -gt 900 ]; then
  run_capture large13B $(( B - 240 )) MODEGPT_BENCH_BASELINE_S=none
fi

B=$(left)
if [ "$B" -gt 600 ]; then
  run_capture large32 $(( B - 120 )) \
    MODEGPT_BENCH_BASELINE_S=27357.18 MODEGPT_STREAM_ASYNC=on \
    MODEGPT_BENCH_STREAM=1
fi
echo "queue: done at $(date -u +%H:%M:%S)" >> /tmp/queue_tail.log
