#!/usr/bin/env bash
# Round-5 TPU capture sequencing. ONE process at a time: the host has a
# single core and the tunnel client is CPU-bound, so captures, CPU
# baselines and test runs must never overlap. The r05 additions over
# run_r04_benches.sh: every streamed capture embeds its own duplex link
# probe + checked wall model (bench.py probe_link_rates/wall_model), and
# flush-depth/async gates now engage via the device_kind HBM table.
#
# Usage: bash scripts/run_r05_benches.sh [small|large32B|moe8|large13B|profile|all]
set -u
cd "$(dirname "$0")/.."
mkdir -p bench_results/r05

capture() {  # $1 preset, $2 budget seconds, extra env via environment
  local preset="$1" budget="$2"
  local out="bench_results/r05/${preset}.json"
  local log="/tmp/bench_r05_${preset}.log"
  echo "=== capture ${preset} (budget ${budget}s)"
  # Host-resident presets MUST compact the tunnel client's H2D replay
  # journal (+1 pinned host GiB per staged GiB otherwise). Trade-off:
  # no replay on a connection drop — fine for a bounded capture.
  local compact=()
  case "$preset" in large13B|large32B|moe8) compact=(AXON_JOURNAL_COMPACT=1) ;; esac
  # Gate on the 5 s link probe — and during a full OUTAGE (the probe
  # HANGS rather than erroring) poll up to ~45 min before giving up,
  # instead of launching an hour-scale capture into a dead tunnel.
  local up=0
  for i in 1 2 3 4 5 6 7 8 9; do
    if timeout 120 python scripts/probe_link_rate.py \
        > "bench_results/r05/link_${preset}.json" 2>/dev/null; then
      echo "link: $(cat bench_results/r05/link_${preset}.json)"; up=1; break
    fi
    echo "link down (probe attempt $i); retrying in 300s"; sleep 300
  done
  if [ "$up" != 1 ]; then echo "SKIPPED ${preset}: tunnel outage"; return 1; fi
  env "${compact[@]}" MODEGPT_BENCH_PRESET="${preset}" \
    timeout "${budget}" python bench.py > "${log}" 2>&1
  local rc=$?
  if [ $rc -eq 0 ] && grep -q '"metric"' "${log}"; then
    if grep '"metric"' "${log}" | tail -1 | grep -q '"device_kind": "cpu"'; then
      echo "SKIPPED capture: bench fell back to CPU (tunnel down?)"; return 1
    fi
    grep '"metric"' "${log}" | tail -1 > "${out}"
    echo "captured: $(cat "${out}")"
  else
    echo "FAILED rc=${rc}; tail of ${log}:"; tail -5 "${log}"
  fi
  return $rc
}

small() {
  capture small 3600
}

large32B() {
  # Flagship capture on the ROUND-4 design (VERDICT r4 next-1): int8 BI
  # prepass (adaptive, probe now syncs all staged leaves), host-side
  # factor slicing (only idx/down/vo cross the D2H link), slimmed
  # window trees, async flush with the HBM-table-engaged gates.
  # Baseline: measured-standalone 84906.8 s (r04 baselines.json).
  MODEGPT_BENCH_SKIP_WARMUP=1 MODEGPT_BENCH_BASELINE_S=84906.81 \
    capture large32B 12000
}

moe8() {
  # MoE flagship re-capture (VERDICT r4 next-2): first capture with
  # host-side EXPERT up/gate factor slicing (commit b0b4c5b) and the
  # int8 prepass. Baseline: measured-standalone 13352.84 s.
  MODEGPT_BENCH_SKIP_WARMUP=1 MODEGPT_BENCH_BASELINE_S=13352.84 \
    capture moe8 9600
}

large13B() {
  # Goal here (VERDICT r4 next-4): flush_depth 2 via the HBM table and
  # flush_wait_s < 10% of e2e.
  MODEGPT_BENCH_SKIP_WARMUP=1 MODEGPT_BENCH_BASELINE_S=19275.52 \
    capture large13B 7200
}

profile() {
  # Per-phase streamed-window profile with the r05 roofline extensions.
  timeout 3600 python scripts/profile_window.py \
    | tee bench_results/r05/profile_window.json
}

all() {
  large32B
  moe8
  large13B
  small
  profile
}

"${1:-all}"
