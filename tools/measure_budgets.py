#!/usr/bin/env python
"""Measure executed shuffle-write bytes for the named queries at sf0.001 and
sf0.01 and record 4x-headroom budgets (64 KiB floor) into
tests/shuffle_budgets.json — the per-query scale gate test_correctness
asserts. Usage: python tools/measure_budgets.py <name> [<name> ...]"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from impalatogo_spark.plans import shuffle_write_bytes
from impalatogo_spark.queries import all_queries
from impalatogo_spark.session import get_spark, release_persisted

FLOOR = 65536
BUDGET_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "shuffle_budgets.json")


def main(names: list[str]) -> None:
    registry = all_queries()
    unknown = [n for n in names if n not in registry]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")
    with open(BUDGET_PATH) as fh:
        budgets = json.load(fh)
    spark = get_spark("measure-budgets")
    for sf_tag in ("sf0.001", "sf0.01"):
        sf_dir = f"/root/testdata/{sf_tag}"
        for n in names:
            df = registry[n].spark_fn(spark, sf_dir)
            df.collect()
            sw = shuffle_write_bytes(df)
            release_persisted()
            budget = max(FLOOR, 4 * sw)
            budgets[sf_tag][n] = budget
            print(f"{sf_tag} {n}: measured {sw:,} B -> budget {budget:,} B")
    with open(BUDGET_PATH, "w") as fh:
        json.dump(budgets, fh, indent=1, sort_keys=True)
        fh.write("\n")


if __name__ == "__main__":
    main(sys.argv[1:])
