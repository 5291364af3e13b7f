"""Dump .explain("formatted") for named registry keys to plans/<tag>/.

Usage:
    python tools/dump_plans.py <tag> <suffix> [key ...]

Writes plans/<tag>/<key>_<suffix>.txt for each key (default: the bench
HEADLINE set).  Planning only — nothing is executed.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from i2mapreduce_spark.queries import build_registry  # noqa: E402
from i2mapreduce_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "agg_pricing_summary", "join_multiway", "window_topk_per_group",
    "mr_wordcount", "stream_session_window", "iter_apriori_pairs",
    "sim_topk_cosine",
]


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r11"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    keys = sys.argv[3:] or HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    queries, _ = build_registry()
    spark = get_spark(app_name="i2mr-plan-dump", shuffle_partitions=8)
    for key in keys:
        df = queries[key](spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        path = os.path.join(out_dir, f"{key}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path} ({len(txt)} bytes)")


if __name__ == "__main__":
    main()
