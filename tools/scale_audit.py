#!/usr/bin/env python
"""Shuffle/timing growth audit across scale factors (VERDICT r05 item 1:
extend the budget growth audit across the 100x span and flag any
super-linear shuffle shape).

Consumes 2+ tools/scale_gate.py reports (which record per-query executed
shuffle-write bytes, wall seconds, and gate status) and emits a markdown
growth table. Growth classification per adjacent SF step, on shuffle
bytes:

  flat       < 2x      (sketches, dimension-bounded aggregates)
  sublinear  < 0.7 * data-growth
  linear     <= 1.5 * data-growth
  SUPER      >  1.5 * data-growth AND absolute bytes large enough to
             matter (small-absolute growth is floor noise)

Data growth between steps is inferred from the sf tags (sf0.01 -> sf0.1
-> sf1 are 10x steps for every table except documents/embeddings at the
smallest SFs, where the driver floors row counts — the audit notes this).

Usage:
  python tools/scale_audit.py --out SCALE_AUDIT_r06.md \
      sf0.01=SCALE_r06_sf001.json sf0.1=SCALE_r06_sf01.json sf1=SCALE_r06_sf1.json
"""

from __future__ import annotations

import argparse
import json

SUPER_FACTOR = 1.5
ABS_FLOOR = 32 * 1024 * 1024  # only flag SUPER when the big side > 32 MiB


def load(path: str) -> dict:
    with open(path) as fh:
        return json.load(fh)["results"]


def classify(ratio: float, data_growth: float, big_bytes: int) -> str:
    if ratio < 2.0:
        return "flat"
    if ratio < 0.7 * data_growth:
        return "sublinear"
    if ratio <= SUPER_FACTOR * data_growth:
        return "linear"
    return "SUPER" if big_bytes > ABS_FLOOR else "super-small"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("reports", nargs="+",
                    help="tag=path pairs, ordered smallest SF first")
    ap.add_argument("--out", default="SCALE_AUDIT.md")
    ap.add_argument("--data-growth", type=float, default=10.0)
    args = ap.parse_args()

    tags, data = [], {}
    for spec in args.reports:
        tag, path = spec.split("=", 1)
        tags.append(tag)
        data[tag] = load(path)

    names = sorted(set().union(*[set(d) for d in data.values()]))
    lines = [
        "# Scale audit: executed shuffle-write growth across SFs",
        "",
        f"Reports: {', '.join(tags)}. Data growth per step assumed "
        f"{args.data_growth}x (documents/embeddings are floored at small "
        "SFs by the driver's generator, so their first step can exceed "
        "the nominal factor without being a plan problem — judged on the "
        "LAST step).",
        "",
        "| query | " + " | ".join(f"{t} bytes" for t in tags)
        + " | " + " | ".join(f"{t} s" for t in tags)
        + " | growth | class |",
        "|---|" + "---|" * (2 * len(tags) + 2),
    ]
    flagged, timeouts, fails = [], [], []
    for n in names:
        recs = [data[t].get(n, {}) for t in tags]
        sbytes = [r.get("shuffle_bytes") for r in recs]
        secs = [r.get("spark_s") for r in recs]
        status = [r.get("status", "-") for r in recs]
        for t, s in zip(tags, status):
            if s in ("SPARK_TIMEOUT",):
                timeouts.append((n, t, "spark"))
            elif s in ("ORACLE_TIMEOUT",):
                timeouts.append((n, t, "oracle"))
            elif s in ("FAIL", "ORACLE_FAIL"):
                fails.append((n, t, recs[tags.index(t)].get("error", "")))
        ratios, klass = [], []
        for i in range(1, len(tags)):
            a, b = sbytes[i - 1], sbytes[i]
            if a is None or b is None:
                continue
            r = (b / a) if a else float("inf") if b else 1.0
            ratios.append(r)
            klass.append(classify(r, args.data_growth, b or 0))
        final = klass[-1] if klass else "-"
        if final == "SUPER":
            flagged.append((n, sbytes, ratios))
        lines.append(
            "| " + n + " | "
            + " | ".join("-" if b is None else f"{b:,}" for b in sbytes)
            + " | " + " | ".join("-" if s is None else f"{s}" for s in secs)
            + " | " + "/".join(f"{r:.1f}x" for r in ratios)
            + f" | {final} |")

    lines += ["", "## Flags", ""]
    if flagged:
        lines.append("Super-linear shuffle growth (fix or justify):")
        for n, sb, rs in flagged:
            lines.append(f"- **{n}**: bytes {sb}, ratios "
                         + "/".join(f"{r:.1f}x" for r in rs))
    else:
        lines.append("No query shows super-linear shuffle growth on the "
                     "final step. ✔")
    if timeouts:
        lines += ["", "Timeouts (per-side wall budget in scale_gate):"]
        for n, t, side in timeouts:
            lines.append(f"- {n} @ {t}: {side} side")
    if fails:
        lines += ["", "Failures:"]
        for n, t, err in fails:
            lines.append(f"- {n} @ {t}: {err[:160]}")

    with open(args.out, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"wrote {args.out}: {len(names)} queries, "
          f"{len(flagged)} super-linear, {len(timeouts)} timeouts, "
          f"{len(fails)} failures")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
