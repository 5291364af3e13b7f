"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   -> flagship query (TPC-H Q1 shape) at sf0.001.
queries()      -> every implemented SURVEY §2B key, (spark, sf_dir) -> DataFrame.
oracle_sql()   -> DuckDB-portable ANSI SQL per hash-checked key.

Implementation lives in the i2mapreduce_spark package; this module only
adapts it to the driver's interface.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from i2mapreduce_spark.queries import build_registry  # noqa: E402

_QUERIES, _ORACLES = build_registry()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _QUERIES["agg_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLES)
