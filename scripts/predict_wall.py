"""Backfill the additive wall model into existing streamed capture JSONs.

Usage:
    python scripts/predict_wall.py <capture.json> [--h2d MB_S] [--d2h MB_S]
        [--link link.json] [--staged-gb GB] [--note TEXT] [--dry-run]

Rates come from --h2d/--d2h, or a link_<preset>.json (h2d only — the
r04 probe measured H2D alone), falling back to the r04 duplex probe's
D2H (33 MB/s, bench_results/r04/probe_duplex.json). Backfilled models
carry a "backfill_note" so nobody mistakes an assumed rate for a
same-session probe — round-5 captures embed the in-bench probe instead
(bench.py probe_link_rates).
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from modegpt_tpu.utils.wallmodel import wall_model  # noqa: E402

R04_DUPLEX_D2H = 33.0  # bench_results/r04/probe_duplex.json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("capture")
    ap.add_argument("--h2d", type=float)
    ap.add_argument("--d2h", type=float)
    ap.add_argument("--link")
    ap.add_argument("--staged-gb", type=float, dest="staged_gb",
                    help="override/add staged_gb (r03 captures lack it)")
    ap.add_argument("--note", default="")
    ap.add_argument("--dry-run", action="store_true")
    args = ap.parse_args()

    cap = json.loads(Path(args.capture).read_text())
    h2d, d2h = args.h2d, args.d2h
    if args.link:
        link = json.loads(Path(args.link).read_text())
        h2d = h2d or link.get("h2d_mb_s")
        d2h = d2h or link.get("d2h_mb_s")
    if d2h is None:
        d2h = R04_DUPLEX_D2H
    if args.staged_gb is not None:
        cap["staged_gb"] = args.staged_gb

    wm = wall_model(cap, h2d, d2h)
    if wm is None:
        print("no streamed byte counters in capture; nothing to model")
        return
    note = args.note or "backfilled with assumed rates, not a same-session probe"
    wm["backfill_note"] = note
    cap["wall_model"] = wm
    print(json.dumps(wm, indent=1))
    if not args.dry_run:
        Path(args.capture).write_text(json.dumps(cap))
        print(f"written into {args.capture}")


if __name__ == "__main__":
    main()
