#!/usr/bin/env bash
# Round-3 TPU bench capture: run each preset's bench.py sequentially
# (ONE TPU process at a time — the tunnel misbehaves with two) and
# record verbatim stdout JSON into bench_results/r03/.
#
#   bash scripts/run_r03_benches.sh [preset ...]
#
# Default order warms the driver-visible compile cache first (small),
# then the round-3 headline runs: large32 (<300s target), large13B
# (beyond-HBM host-resident), moe8 (MoE beyond-HBM).
set -uo pipefail

cd "$(dirname "$0")/.."
mkdir -p bench_results/r03

run_one() {
  local preset="$1" budget="$2"
  local out="bench_results/r03/${preset}.json"
  local log="/tmp/bench_r03_${preset}.log"
  echo "=== preset=${preset} budget=${budget}s -> ${out}"
  MODEGPT_BENCH_PRESET="${preset}" timeout "${budget}" \
    python bench.py > "${log}" 2>&1
  local rc=$?
  # bench prints exactly one JSON line on success; a CPU-fallback line
  # (tunnel bounced mid-run) must not be recorded as a TPU capture
  if [ $rc -eq 0 ] && grep -q '"metric"' "${log}"; then
    if grep '"metric"' "${log}" | tail -1 | grep -q '"device_kind": "cpu"'; then
      echo "SKIPPED capture: bench fell back to CPU (tunnel down?)"
      return 1
    fi
    grep '"metric"' "${log}" | tail -1 > "${out}"
    echo "captured: $(cat "${out}")"
  else
    echo "FAILED rc=${rc}; tail of ${log}:"
    tail -5 "${log}"
  fi
  return $rc
}

if [ $# -gt 0 ]; then
  for p in "$@"; do
    case "$p" in
      small) run_one small 7200 ;;
      large32) run_one large32 9000 ;;
      large13B) run_one large13B 14000 ;;
      moe8) run_one moe8 14000 ;;
      *) echo "unknown preset $p"; exit 2 ;;
    esac
  done
else
  run_one small 7200
  run_one large32 9000
  run_one large13B 14000
  run_one moe8 14000
fi
