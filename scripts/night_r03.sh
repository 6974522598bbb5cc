#!/usr/bin/env bash
# Sequenced overnight work for round 3 on the ONE-core TPU host (nothing
# may run concurrently: TPU captures, torch baselines and pytest all
# contend for the same core — see bench_results/r03/README).
#
#   bash scripts/night_r03.sh <large32B-runner-pid>
#
# 1. wait for the in-flight large32B capture (runner pid) to finish
# 2. probe the tunnel link's duplex/compute overlap (probe_duplex.py)
# 3. re-capture large13B with stream_flush_depth=3 (A/B vs the depth-1
#    capture already in large13B.json; writes large13B_d3.json)
# 4. measure the torch-CPU baselines for large32B and moe8 (hours)
# 5. full CPU test suite
set -uo pipefail
cd "$(dirname "$0")/.."

log() { echo "[$(date +%H:%M:%S)] $*"; }

PID="${1:-}"
if [ -n "$PID" ]; then
  log "waiting for capture runner pid $PID"
  while kill -0 "$PID" 2>/dev/null; do sleep 60; done
  log "capture runner exited"
fi

log "=== probe_duplex"
timeout 900 python scripts/probe_duplex.py > /tmp/probe_duplex.log 2>&1
if grep -q h2d_mb_s /tmp/probe_duplex.log; then
  grep h2d_mb_s /tmp/probe_duplex.log | tail -1 > bench_results/r03/probe_duplex.json
  log "captured: $(cat bench_results/r03/probe_duplex.json)"
else
  log "probe_duplex FAILED"; tail -3 /tmp/probe_duplex.log
fi

log "=== large13B flush-depth-3 A/B re-capture"
cp bench_results/r03/large13B.json /tmp/large13B_d1.json.bak
MODEGPT_BENCH_BASELINE_S=19275.52 MODEGPT_STREAM_FLUSH_DEPTH=3 \
  bash scripts/run_r03_benches.sh large13B
if [ -s bench_results/r03/large13B.json ] && \
   ! cmp -s bench_results/r03/large13B.json /tmp/large13B_d1.json.bak; then
  mv bench_results/r03/large13B.json bench_results/r03/large13B_d3.json
fi
cp /tmp/large13B_d1.json.bak bench_results/r03/large13B.json

log "=== torch baseline large32B"
MODEGPT_BENCH_PRESET=large32B timeout 18000 python scripts/measure_baseline.py \
  > /tmp/baseline_large32B.log 2>&1 || log "baseline large32B FAILED/timeout"
tail -1 /tmp/baseline_large32B.log

log "=== torch baseline moe8"
MODEGPT_BENCH_PRESET=moe8 timeout 18000 python scripts/measure_baseline.py \
  > /tmp/baseline_moe8.log 2>&1 || log "baseline moe8 FAILED/timeout"
tail -1 /tmp/baseline_moe8.log

log "=== full CPU test suite"
XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
  timeout 3600 python -m pytest tests/ -q > /tmp/night_pytest.log 2>&1
tail -2 /tmp/night_pytest.log
log "night sequence done"
