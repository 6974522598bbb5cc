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
  local preset="$1" budget="$2" outname="${3:-$1}"
  shift 2; [ $# -gt 0 ] && shift
  local extra=("$@")  # extra env VAR=val pairs for named variants
  local out="bench_results/r03/${outname}.json"
  local log="/tmp/bench_r03_${outname}.log"
  echo "=== preset=${preset} budget=${budget}s -> ${out}"
  # Host-resident presets skip the separate warmup pass: the 13B run was
  # host-OOM-killed (130 GB RSS / 125 GB host) holding warmup leftovers
  # beside a second fresh 25 GB model — one pass halves host exposure
  # (n_compiles/compile_s in the JSON keep the timing honest; the disk
  # compile cache makes repeat runs cheap anyway).
  local skip=""
  case "$preset" in large13B|large32B|moe8) skip=1 ;; esac
  # Host-resident presets stage the whole model through H2D (twice: BI
  # prepass + tap sweep). The tunnel client journals every op's payload
  # so it can replay on a connection drop — measured: +1 host-pinned
  # GiB per staged GiB, forever, under EVERY buffer discipline
  # (scripts/probe_h2d_rss.py). AXON_JOURNAL_COMPACT lets the client
  # compact destroyed buffers out of the journal at the next D2H round
  # trip (the sweep's per-layer BI fetch), bounding pins to ~one staged
  # layer — large32B's 128 GB of staging would otherwise OOM the host.
  # Trade-off: a mid-run connection drop can no longer replay (the run
  # fails instead of recovering) — acceptable for a bounded capture.
  local compact=()
  case "$preset" in large13B|large32B|moe8) compact=(AXON_JOURNAL_COMPACT=1) ;; esac
  # First-time beyond-HBM captures skip the torch baseline: the 13B/32B
  # geometry t(1)/t(2) extrapolation runs hours on this host's ONE core
  # AFTER the jax measurement, and a timeout there would destroy the
  # whole capture (the JSON prints last). Baselines are measured
  # separately (scripts/measure_baseline.py) and re-injected via
  # MODEGPT_BENCH_BASELINE_S; an inherited value wins over "none".
  local baseline=()
  case "$preset" in
    large13B|large32B|moe8)
      baseline=(MODEGPT_BENCH_BASELINE_S="${MODEGPT_BENCH_BASELINE_S:-none}") ;;
  esac
  env "${compact[@]}" "${baseline[@]}" "${extra[@]}" \
    MODEGPT_BENCH_PRESET="${preset}" MODEGPT_BENCH_SKIP_WARMUP="${skip}" \
    timeout "${budget}" python bench.py > "${log}" 2>&1
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

# Serving decode A/B: xla full-pool contraction vs the ragged Pallas
# flash-decoding kernel, bf16 vs int8 KV, partial vs near-full
# occupancy. Resolves decode_attn="auto" with hardware evidence
# (kernels/ragged_decode.py predicts ~4x less cache-read bandwidth at
# 25% occupancy; int8 KV should become a real decode speedup only on
# the ragged path, where codes feed the MXU without a dequant temp).
serving_ab() {
  mkdir -p bench_results/r03/serving_ab
  local common="MODEGPT_SERVE_SLOTS=64 MODEGPT_SERVE_MAXLEN=2048 \
MODEGPT_SERVE_STEPS=64 MODEGPT_SERVE_MULTI=16 MODEGPT_SERVE_SKIP_EVAL=1"
  for cfg in \
      "xla__bf16__0.25:" \
      "ragged_bf16__0.25:MODEGPT_DECODE_ATTN=ragged" \
      "xla__int8__0.25:MODEGPT_SERVE_KV_INT8=1" \
      "ragged_int8__0.25:MODEGPT_DECODE_ATTN=ragged MODEGPT_SERVE_KV_INT8=1" \
      "xla__bf16__0.85:" \
      "ragged_bf16__0.85:MODEGPT_DECODE_ATTN=ragged"; do
    local name="${cfg%%:*}" extra="${cfg#*:}"
    local occ="0.25"
    case "$name" in *0.85) occ="0.85" ;; esac
    local out="bench_results/r03/serving_ab/${name}.json"
    local log="/tmp/bench_ab_${name}.log"
    echo "=== serving A/B ${name}"
    env ${common} MODEGPT_SERVE_OCC="${occ}" ${extra} \
      timeout 2400 python scripts/bench_serving.py > "${log}" 2>&1
    if [ $? -eq 0 ] && grep -q decode_step_fused_ms "${log}"; then
      grep decode_step_fused_ms "${log}" | tail -1 > "${out}"
      echo "captured: $(cat "${out}")"
    else
      echo "FAILED; tail of ${log}:"; tail -5 "${log}"
    fi
  done
}

# Prefill W8A8 A/B (scripts/bench_serving.py prefill-burst section):
# bf16 vs int8 weight-only vs int8+W8A8 at a compute-bound shape
# (64 slots x 256-token prompts, 0.5B model). The int8 x int8 MXU runs
# at 2x the bf16 peak on v5e, so the batched burst should show up to
# ~2x vs bf16 once compute-bound.
prefill_a8() {
  mkdir -p bench_results/r03/prefill_a8
  local common="MODEGPT_SERVE_PREFILL=1 MODEGPT_SERVE_SLOTS=64 \
MODEGPT_SERVE_PROMPT=256 MODEGPT_SERVE_MAXLEN=1024"
  for cfg in \
      "bf16:" \
      "int8:MODEGPT_SERVE_INT8=1" \
      "w8a8:MODEGPT_SERVE_INT8=1 MODEGPT_SERVE_A8=1"; do
    local name="${cfg%%:*}" extra="${cfg#*:}"
    local out="bench_results/r03/prefill_a8/${name}.json"
    local log="/tmp/bench_a8_${name}.log"
    echo "=== prefill A/B ${name}"
    env ${common} ${extra} \
      timeout 2400 python scripts/bench_serving.py > "${log}" 2>&1
    if [ $? -eq 0 ] && grep -q prefill_burst_batched_ms "${log}"; then
      grep prefill_burst_batched_ms "${log}" | tail -1 > "${out}"
      echo "captured: $(cat "${out}")"
    else
      echo "FAILED; tail of ${log}:"; tail -5 "${log}"
    fi
  done
}

# Serving LOAD benchmark (scripts/bench_serving_load.py): Poisson
# arrivals through the real scheduler — TTFT/TPOT percentiles +
# sustained throughput. A/B: mixed prefill+decode rounds (decode
# piggybacks on batched prefill dispatches — the win scales with the
# per-dispatch tunnel floor), and the ragged decode kernel under load.
serving_load() {
  mkdir -p bench_results/r03/serving_load
  local common="MODEGPT_LOAD_SLOTS=16 MODEGPT_LOAD_N=48 MODEGPT_LOAD_RATE=8 \
MODEGPT_LOAD_MULTI=8"
  # decode_attn pinned per arm: "auto" now resolves per dispatch type
  # and pool size on TPU (at this 16x1024 config: full-ragged). The
  # committed mixed1_hybrid.json artifact predates that small-pool
  # ragged-decode policy — it was captured under the intermediate
  # ragged-prefill/xla-decode hybrid and is kept (renamed) for the A/B
  # record; a fresh auto capture writes mixed1_auto.json and should
  # match mixed1_ragged_rerun at this pool size.
  for cfg in \
      "mixed1:MODEGPT_LOAD_DECODE_ATTN=xla" \
      "mixed0:MODEGPT_LOAD_MIXED=0 MODEGPT_LOAD_DECODE_ATTN=xla" \
      "mixed1_ragged:MODEGPT_LOAD_DECODE_ATTN=ragged" \
      "mixed1_auto:MODEGPT_LOAD_DECODE_ATTN=auto"; do
    local name="${cfg%%:*}" extra="${cfg#*:}"
    local out="bench_results/r03/serving_load/${name}.json"
    local log="/tmp/bench_load_${name}.log"
    echo "=== serving load ${name}"
    env ${common} ${extra} \
      timeout 2400 python scripts/bench_serving_load.py > "${log}" 2>&1
    if [ $? -eq 0 ] && grep -q ttft_p50_ms "${log}"; then
      if grep ttft_p50_ms "${log}" | tail -1 | grep -q '"device_kind": "cpu"'; then
        echo "SKIPPED capture: CPU fallback"; continue
      fi
      grep ttft_p50_ms "${log}" | tail -1 > "${out}"
      echo "captured: $(cat "${out}")"
    else
      echo "FAILED; tail of ${log}:"; tail -5 "${log}"
    fi
  done
}

if [ $# -gt 0 ]; then
  for p in "$@"; do
    case "$p" in
      small) run_one small 7200 ;;
      large32) run_one large32 9000 ;;
      # compress-then-serve variant: factors stay in HBM as bf16 slices
      # (stream_fetch=device) and dense kernels release as factors land —
      # zero factor D2H, so the tunnel's ~30 MB/s drain term vanishes.
      # Same re-audited torch baseline as large32 (identical workload).
      large32_device) run_one large32 9000 large32_device \
        MODEGPT_STREAM_FETCH=device MODEGPT_BENCH_BASELINE_S=27357.18 ;;
      large13B) run_one large13B 14000 ;;
      large32B) run_one large32B 21600 ;;
      # flagship variant: two async window flushes in flight — the sweep
      # runs a window ahead of the tunnel's D2H factor drain (depth 1
      # left flush_wait_s=1148 of 3341s). Only worth capturing if
      # probe_duplex shows D2H actually proceeds beside H2D/compute.
      large32B_d2) run_one large32B 21600 large32B_d2 \
        MODEGPT_STREAM_FLUSH_DEPTH=2 ;;
      moe8) run_one moe8 14000 ;;
      serving_ab) serving_ab ;;
      serving_load) serving_load ;;
      prefill_a8) prefill_a8 ;;
      *) echo "unknown preset $p"; exit 2 ;;
    esac
  done
else
  run_one small 7200
  run_one large32 9000
  serving_ab
  serving_load
  run_one large13B 14000
  run_one moe8 14000
fi
