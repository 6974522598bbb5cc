"""Measure the reference-equivalent torch-CPU baseline for a bench
preset SEPARATELY from the TPU capture.

The beyond-HBM presets (large13B / large32B / moe8) capture with
MODEGPT_BENCH_BASELINE_S=none because the t(1)/t(2) two-point
extrapolation (bench.py main(), same method the medium/large presets
use in-run) takes hours at 13B-32B geometry on this host's single CPU
core — running it inside the capture risks the runner timeout
destroying the whole TPU measurement.

This script runs exactly that measurement standalone and appends one
JSON line per preset to bench_results/r03/baselines.json:

  {"preset": ..., "t1_s": ..., "t2_s": ..., "n_layers": N,
   "baseline_s": t1 + (t2-t1)*(N-1), "method": "two-point extrapolation",
   ...}

The TPU capture JSONs stay verbatim (vs_baseline null); the implied
speedup is baseline_s / capture value, recorded in the bench README.
Re-captures can inject the measured number via MODEGPT_BENCH_BASELINE_S.

Run:  MODEGPT_BENCH_PRESET=large13B python scripts/measure_baseline.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# bench.py probes the backend at import; the baseline is pure torch-CPU,
# so force the CPU platform and never touch the tunnel.
os.environ.setdefault("JAX_PLATFORMS", "cpu")


def main() -> None:
    preset = os.environ.get("MODEGPT_BENCH_PRESET", "")
    if not preset:
        sys.exit("set MODEGPT_BENCH_PRESET (large13B / large32B / moe8 / ...)")
    import bench

    out = os.environ.get("MODEGPT_BASELINE_OUT", "bench_results/r03/baselines.json")

    def _persist(row):
        rows = []
        if os.path.exists(out):
            with open(out) as f:
                rows = json.load(f)
            rows = [r for r in rows if r.get("preset") != preset]
        rows.append(row)
        os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
        with open(out, "w") as f:
            json.dump(rows, f, indent=1)

    t0 = time.time()
    t1 = bench.bench_torch_reference(1)
    # t(1) alone is ~30-60 min of f64 linalg at 32B geometry — persist it
    # immediately (partial=true) so a runner timeout mid-t(2) loses one
    # point, not the session's CPU time.
    _persist({
        "preset": preset, "metric_label": bench._LABEL, "t1_s": round(t1, 2),
        "n_layers": bench.N_LAYERS, "partial": True,
    })
    t2 = bench.bench_torch_reference(2)
    per_layer = max(t2 - t1, 0.0)
    baseline = t1 + per_layer * (bench.N_LAYERS - 1)
    row = {
        "preset": preset,
        "metric_label": bench._LABEL,
        "t1_s": round(t1, 2),
        "t2_s": round(t2, 2),
        "n_layers": bench.N_LAYERS,
        "baseline_s": round(baseline, 2),
        "method": "two-point extrapolation (bench.py main(), run standalone)",
        "host": "single-core torch CPU, f64 hooked-calibration + solvers",
        "threads": 1,
        "measured_at_s": round(time.time() - t0, 1),
    }
    _persist(row)
    print(json.dumps(row))


if __name__ == "__main__":
    main()
