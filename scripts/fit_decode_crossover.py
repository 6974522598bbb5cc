#!/usr/bin/env python
"""Fit the ragged-vs-xla pure-decode crossover from the r04 pool sweep.

Reads bench_results/r04/decode_sweep/{xla,ragged}_{rows}.json (written
by run_r04_benches.sh sweep), prints the per-pool speed ratio and the
largest pool size where the ragged kernel still wins, i.e. the measured
value for serving.AUTO_RAGGED_DECODE_POOL_ROWS — replacing the r03
2-point interpolation (models/serving.py) with a curve.

The crossover is taken as the geometric midpoint between the largest
ragged-wins pool and the smallest xla-wins pool (same convention as the
r03 interpolation, now bracketed by adjacent measured points instead of
a 8x-apart pair).
"""

import json
import sys
from pathlib import Path

root = Path(sys.argv[1] if len(sys.argv) > 1 else "bench_results/r04/decode_sweep")
by_rows = {}
for f in root.glob("*.json"):
    attn, rows = f.stem.rsplit("_", 1)
    d = json.loads(f.read_text())
    by_rows.setdefault(int(rows), {})[attn] = d.get("decode_step_fused_ms")

rows_sorted = sorted(by_rows)
wins, losses = [], []
print(f"{'pool rows':>10} {'xla ms':>9} {'ragged ms':>10} {'ragged/xla':>11}")
for rows in rows_sorted:
    d = by_rows[rows]
    if "xla" not in d or "ragged" not in d or not d["xla"] or not d["ragged"]:
        print(f"{rows:>10}  (incomplete)")
        continue
    ratio = d["ragged"] / d["xla"]
    print(f"{rows:>10} {d['xla']:>9.2f} {d['ragged']:>10.2f} {ratio:>11.3f}")
    (wins if ratio < 1.0 else losses).append(rows)

if wins and losses:
    lo, hi = max(wins), min(losses)
    if lo < hi:
        crossover = int((lo * hi) ** 0.5)
        print(f"\nragged wins up to {lo}, xla from {hi}; "
              f"geometric-midpoint crossover = {crossover} rows")
    else:
        print(f"\nNON-MONOTONE: ragged wins at {sorted(wins)}, "
              f"loses at {sorted(losses)} — inspect before updating the constant")
elif wins:
    print(f"\nragged wins at every measured pool (max {max(wins)})")
elif losses:
    print(f"\nxla wins at every measured pool (min {min(losses)})")
