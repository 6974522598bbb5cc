#!/usr/bin/env python
"""Merge standalone-measured torch baselines into captured bench JSONs.

First-time beyond-HBM captures run with MODEGPT_BENCH_BASELINE_S=none
(the t(1)/t(2) torch extrapolation takes hours on this host's one core
and would risk the whole capture — scripts/run_r03_benches.sh). The
baselines are measured afterwards by scripts/measure_baseline.py into
bench_results/rNN/baselines.json; this script folds them back into the
captured preset JSONs so vs_baseline is populated with an honest
provenance tag (baseline_source: "measured-standalone").

Usage: python scripts/inject_baselines.py [bench_results/r03]
"""
import json
import sys
from pathlib import Path

root = Path(sys.argv[1] if len(sys.argv) > 1 else "bench_results/r03")
baselines = {b["preset"]: b for b in json.loads((root / "baselines.json").read_text())}

for preset, b in baselines.items():
    f = root / f"{preset}.json"
    if not f.exists():
        print(f"{preset}: no capture yet, skipping")
        continue
    cap = json.loads(f.read_text())
    if cap.get("baseline_source") not in (None, "unmeasured", "measured-standalone"):
        print(f"{preset}: baseline_source={cap['baseline_source']!r}, leaving as-is")
        continue
    cap["vs_baseline"] = round(b["baseline_s"] / cap["value"], 3)
    cap["baseline_source"] = "measured-standalone"
    cap["baseline_s"] = b["baseline_s"]
    f.write_text(json.dumps(cap) + "\n")
    print(f"{preset}: vs_baseline={cap['vs_baseline']} (baseline {b['baseline_s']}s)")
