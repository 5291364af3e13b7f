"""Automated plan audit over the whole registry (r11 methodology,
committed as a tool in r12): count the plan-shape metrics the
optimization guide says to look for, per key, from
.explain("formatted") of each declared query's final frame.

Metrics: Exchange count, BatchEvalPython (row-at-a-time Python),
ArrowEvalPython/pandas nodes, CartesianProduct,
BroadcastNestedLoopJoin, single-partition windows, SortMergeJoin,
sorts.  Keys whose build executes driver-side fixpoints (iter_*) are
audited on their final returned frame — for those the counts cover the
lazily-retained parts (trim batches, per-pass filters), which is the
plan the session actually retains.

Usage: python tools/plan_audit.py <out.json> [key ...]   (default: all)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from i2mapreduce_spark.queries import build_registry  # noqa: E402
from i2mapreduce_spark.session import get_spark  # noqa: E402


def audit_plan(txt: str) -> dict:
    return {
        "exchanges": txt.count("Exchange"),
        "batch_py": txt.count("BatchEvalPython"),
        "arrow_py": (txt.count("ArrowEvalPython") + txt.count("MapInPandas")
                     + txt.count("FlatMapGroupsInPandas")
                     + txt.count("FlatMapCoGroupsInPandas")
                     + txt.count("MapInArrow")),
        "cartesian": txt.count("CartesianProduct"),
        "nested_loop": txt.count("BroadcastNestedLoopJoin"),
        "smj": txt.count("SortMergeJoin"),
        # unpartitioned window/sort funnels show up as a SinglePartition
        # exchange in formatted explain (the r11 audit's
        # "single-partition window" class)
        "single_part_window": txt.count("SinglePartition"),
        # tree lines print "Sort (n)"; detail sections print "(n) Sort"
        # — counting the tree spelling counts each node exactly once
        "sorts": txt.count("Sort ("),
    }


def main() -> None:
    out_path = sys.argv[1]
    queries, _ = build_registry()
    keys = sys.argv[2:] or list(queries)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark(app_name="plan-audit", shuffle_partitions=8)
    out: dict = {}
    for key in keys:
        try:
            df = queries[key](spark, sf_dir)
            txt = spark._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            out[key] = audit_plan(txt)
        except Exception as exc:  # noqa: BLE001 — record, don't die
            out[key] = {"error": f"{type(exc).__name__}: {str(exc)[:150]}"}
        with open(out_path, "w") as f:
            json.dump(out, f, indent=1)
    print(f"audited {len(out)} keys -> {out_path}")


if __name__ == "__main__":
    main()
