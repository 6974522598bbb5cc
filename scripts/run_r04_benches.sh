#!/usr/bin/env bash
# Round-4 TPU capture sequencing. ONE process at a time: the host has a
# single core and the tunnel client is CPU-bound, so captures, CPU
# baselines and test runs must never overlap (scripts/probe_duplex.py:
# the link itself is serialised too — H2D 89 MB/s, D2H 33 MB/s, no
# duplex).
#
# Usage: bash scripts/run_r04_benches.sh [small|large32B|moe8|sweep|profile|baselines|all]
set -u
cd "$(dirname "$0")/.."
mkdir -p bench_results/r04

capture() {  # $1 preset, $2 budget seconds, extra env via environment
  local preset="$1" budget="$2"
  local out="bench_results/r04/${preset}.json"
  local log="/tmp/bench_r04_${preset}.log"
  echo "=== capture ${preset} (budget ${budget}s)"
  # Host-resident presets MUST compact the tunnel client's H2D replay
  # journal (+1 pinned host GiB per staged GiB otherwise — the 96 GB of
  # large32B staging would OOM the 125 GB host; see run_r03_benches.sh
  # and scripts/probe_h2d_rss.py). Trade-off: no replay on a connection
  # drop — fine for a bounded capture.
  local compact=()
  case "$preset" in large13B|large32B|moe8) compact=(AXON_JOURNAL_COMPACT=1) ;; esac
  # record the link rate of the session next to the capture: the tunnel
  # swings >8x within a day, so a capture is only interpretable with its
  # session's measured H2D rate alongside
  timeout 120 python scripts/probe_link_rate.py \
    > "bench_results/r04/link_${preset}.json" 2>/dev/null \
    && echo "link: $(cat bench_results/r04/link_${preset}.json)"
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
  # full pipeline sanity + the pinned-methodology baseline (median of 3,
  # recorded samples — reconciles the r03 170x-vs-380x discrepancy)
  capture small 3600
}

large32B() {
  # Flagship re-capture with the r4 link-byte cuts: int8 BI prepass
  # (auto), host-side factor slicing (only idx/down/vo cross the link),
  # auto flush depth. Baseline injected afterwards by `baselines`.
  MODEGPT_BENCH_SKIP_WARMUP=1 MODEGPT_BENCH_BASELINE_S=none \
    capture large32B 7200
}

moe8() {
  MODEGPT_BENCH_SKIP_WARMUP=1 MODEGPT_BENCH_BASELINE_S=none \
    capture moe8 5400
}

large13B() {
  # Half the link exposure of large32B with the same r4 byte-cut story
  # and an already-measured torch baseline (19275.5 s, r03): the
  # fallback flagship when the tunnel is dropping connections.
  MODEGPT_BENCH_SKIP_WARMUP=1 \
    MODEGPT_BENCH_BASELINE_S=19275.52 \
    capture large13B 5400
}

# Ragged-decode crossover sweep (VERDICT r3 next-8 / ADVICE): pure
# decode xla-vs-ragged across pool sizes 4k..131k rows, one occupancy
# regime (0.25, the serving default). Replaces the 2-point interpolation
# behind AUTO_RAGGED_DECODE_POOL_ROWS with a measured curve.
sweep() {
  mkdir -p bench_results/r04/decode_sweep
  local common="MODEGPT_SERVE_STEPS=64 MODEGPT_SERVE_MULTI=16 \
MODEGPT_SERVE_SKIP_EVAL=1 MODEGPT_SERVE_OCC=0.25"
  for pool in "8:512" "8:1024" "16:1024" "16:2048" "32:2048" "64:2048"; do
    local slots="${pool%%:*}" maxlen="${pool#*:}"
    local rows=$((slots * maxlen))
    for attn in xla ragged; do
      local name="${attn}_${rows}"
      local out="bench_results/r04/decode_sweep/${name}.json"
      local log="/tmp/bench_sweep_${name}.log"
      echo "=== decode sweep ${name} (${slots}x${maxlen})"
      local extra=""
      [ "${attn}" = ragged ] && extra="MODEGPT_DECODE_ATTN=ragged"
      env ${common} MODEGPT_SERVE_SLOTS="${slots}" \
        MODEGPT_SERVE_MAXLEN="${maxlen}" ${extra} \
        timeout 1800 python scripts/bench_serving.py > "${log}" 2>&1
      if [ $? -eq 0 ] && grep -q decode_step_fused_ms "${log}"; then
        grep decode_step_fused_ms "${log}" | tail -1 > "${out}"
        echo "captured: $(cat "${out}")"
      else
        echo "FAILED; tail of ${log}:"; tail -5 "${log}"
      fi
    done
  done
  python scripts/fit_decode_crossover.py bench_results/r04/decode_sweep || true
}

profile() {
  # Per-phase device-time + roofline evidence for the streamed sweep
  # (VERDICT r3 next-5): drives one large32-geometry window with
  # per-dispatch syncs and an optional jax.profiler trace.
  timeout 3600 python scripts/profile_window.py \
    | tee bench_results/r04/profile_window.json
}

baselines() {
  # Standalone torch-CPU t(1)/t(2) extrapolation for the flagship
  # presets (VERDICT r3 next-3) — hours of single-core f64 linalg, so
  # last in the sequence; t(1) is persisted as soon as it is measured.
  for preset in large32B moe8; do
    echo "=== baseline ${preset}"
    MODEGPT_BENCH_PRESET="${preset}" \
      MODEGPT_BASELINE_OUT=bench_results/r04/baselines.json \
      timeout 14000 python scripts/measure_baseline.py \
      || echo "baseline ${preset} incomplete"
  done
  python scripts/inject_baselines.py bench_results/r04 || true
}

all() {
  small
  large32B
  moe8
  sweep
  profile
  baselines
}

"${1:-all}"
