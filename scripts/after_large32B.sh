#!/usr/bin/env bash
# Post-large32B sequencer for round 3 (host rebooted; the overnight
# night_r03.sh chain was lost with /tmp — this is its replacement,
# re-ordered so the most driver-critical artifacts land first).
#
#   bash scripts/after_large32B.sh <large32B-runner-pid>
#
# Runs, strictly one job at a time on this ONE-core host:
#   1. wait for the in-flight large32B capture (runner pid)
#   2. re-capture `small` — the reboot emptied ~/.cache/modegpt_tpu, so
#      this re-warms the on-disk compile cache the driver's end-of-round
#      bench.py run depends on (and refreshes the small JSON)
#   3. full CPU test suite (early red/green signal while there is still
#      wall-clock to fix anything)
#   4. torch-CPU baseline for large32B, folded into the capture JSON
#   5. tunnel duplex probe (H2D/D2H overlap characterisation)
#   6. torch-CPU baseline for moe8, folded in (time permitting)
set -uo pipefail
cd "$(dirname "$0")/.."

log() { echo "[$(date +%H:%M:%S)] $*"; }

PID="${1:-}"
if [ -n "$PID" ]; then
  log "waiting for capture runner pid $PID"
  while kill -0 "$PID" 2>/dev/null; do sleep 60; done
  log "capture runner exited"
  [ -s bench_results/r03/large32B.json ] \
    && log "large32B captured: $(cat bench_results/r03/large32B.json)" \
    || log "large32B NOT captured; tail: $(tail -3 /tmp/bench_r03_large32B.log 2>/dev/null)"
fi

if [ "${SKIP_SMALL:-}" != "1" ]; then
  log "=== small re-capture (re-warm compile cache post-reboot)"
  bash scripts/run_r03_benches.sh small || log "small re-capture FAILED"
fi

log "=== full CPU test suite"
XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
  timeout 3600 python -m pytest tests/ -q > /tmp/night_pytest.log 2>&1
tail -2 /tmp/night_pytest.log

log "=== torch baseline large32B"
MODEGPT_BENCH_PRESET=large32B timeout 18000 python scripts/measure_baseline.py \
  > /tmp/baseline_large32B.log 2>&1 || log "baseline large32B FAILED/timeout"
tail -1 /tmp/baseline_large32B.log
python scripts/inject_baselines.py bench_results/r03 || true

log "=== probe_duplex"
timeout 900 python scripts/probe_duplex.py > /tmp/probe_duplex.log 2>&1
if grep -q h2d_mb_s /tmp/probe_duplex.log; then
  grep h2d_mb_s /tmp/probe_duplex.log | tail -1 > bench_results/r03/probe_duplex.json
  log "captured: $(cat bench_results/r03/probe_duplex.json)"
else
  log "probe_duplex FAILED"; tail -3 /tmp/probe_duplex.log
fi

log "=== torch baseline moe8"
MODEGPT_BENCH_PRESET=moe8 timeout 14400 python scripts/measure_baseline.py \
  > /tmp/baseline_moe8.log 2>&1 || log "baseline moe8 FAILED/timeout"
tail -1 /tmp/baseline_moe8.log
python scripts/inject_baselines.py bench_results/r03 || true

log "sequence done"
