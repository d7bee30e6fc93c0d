#!/usr/bin/env python
"""Bench trend tracking: diff two per-query benchmark result files and
print the regression/improvement table (the round-over-round comparison
the judge otherwise has to compute by hand).

Usage:
  python tools/bench_compare.py                 # newest BENCH_r*.json (or
                                                # bench_baseline.json) vs
                                                # bench_results.json
  python tools/bench_compare.py OLD.json NEW.json
  python tools/bench_compare.py --threshold 1.2

Accepted formats: bench.py's own output ({"queries": {name: sec}, ...})
and the driver's BENCH_r*.json wrapper ({"parsed": {...}}). Exit code 1
when any overlapping query drifted slower than the threshold (default
1.3x), so CI-style use is one command.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_queries(path: str, use_min: bool = False) -> dict[str, float]:
    with open(path) as fh:
        d = json.load(fh)
    if isinstance(d, dict) and "parsed" in d:  # driver BENCH_r*.json wrapper
        d = d["parsed"]
    if not isinstance(d, dict) or not isinstance(d.get("queries"), dict):
        raise SystemExit(f"{path}: no per-query map found (parsed=null?)")
    # per-query minima across interleaved passes: the interference-robust
    # signal (r03 verdict — box-load spikes inflate medians, minima agree
    # across independent runs); present from r04 bench.py on
    key = "queries_min" if use_min and isinstance(
        d.get("queries_min"), dict) else "queries"
    return {k: float(v) for k, v in d[key].items()}


def default_old() -> str | None:
    # prefer an explicitly saved baseline, else the newest driver artifact
    # that actually parsed
    explicit = os.path.join(REPO, "bench_baseline.json")
    if os.path.exists(explicit):
        return explicit
    for path in sorted(glob.glob(os.path.join(REPO, "BENCH_r*.json")),
                       reverse=True):
        try:
            load_queries(path)
            return path
        except SystemExit:
            continue
    return None


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("old", nargs="?", default=None)
    ap.add_argument("new", nargs="?",
                    default=os.path.join(REPO, "bench_results.json"))
    ap.add_argument("--threshold", type=float, default=1.3,
                    help="flag ratio for slower-than drift (default 1.3)")
    ap.add_argument("--min-sec", type=float, default=0.2,
                    help="ignore drifts where both sides are under this "
                         "many seconds (scheduling noise floor)")
    ap.add_argument("--use-min", action="store_true",
                    help="compare per-query minima across passes when the "
                         "artifact has them (interference-robust signal)")
    args = ap.parse_args()
    old_path = args.old or default_old()
    if not old_path:
        raise SystemExit("no previous bench artifact found to compare against")
    old = load_queries(old_path, use_min=args.use_min)
    new = load_queries(args.new, use_min=args.use_min)

    overlap = sorted(set(old) & set(new))
    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))
    slower, faster = [], []
    for q in overlap:
        o, n = old[q], new[q]
        if max(o, n) < args.min_sec:
            continue
        ratio = n / o if o > 0 else float("inf")
        if ratio >= args.threshold:
            slower.append((ratio, q, o, n))
        elif ratio <= 1 / args.threshold:
            faster.append((ratio, q, o, n))

    print(f"old: {old_path}  ({len(old)} queries, "
          f"total {sum(old.values()):.1f}s)")
    print(f"new: {args.new}  ({len(new)} queries, "
          f"total {sum(new.values()):.1f}s)")
    ot = sum(old[q] for q in overlap)
    nt = sum(new[q] for q in overlap)
    if overlap:
        print(f"overlap: {len(overlap)} queries, {ot:.1f}s -> {nt:.1f}s "
              f"({(nt - ot) / ot * 100:+.1f}%)")
    if added:
        print(f"added ({len(added)}): {', '.join(added[:10])}"
              + (" ..." if len(added) > 10 else ""))
    if removed:
        print(f"removed ({len(removed)}): {', '.join(removed)}")

    def table(title, rows):
        if not rows:
            return
        print(f"\n{title}")
        for ratio, q, o, n in sorted(rows, key=lambda r: -abs(r[0] - 1)):
            print(f"  {q:<40} {o:>7.2f}s -> {n:>7.2f}s  ({ratio:.2f}x)")

    table(f"SLOWER >= {args.threshold}x (investigate):", slower)
    table(f"faster <= {1 / args.threshold:.2f}x:", faster)
    if not slower and not faster:
        print("no drifts beyond threshold")
    sys.exit(1 if slower else 0)


if __name__ == "__main__":
    main()
