"""Driver-replica correctness gate: every hash-checked query key must
match the DuckDB oracle (row count + schema + order-insensitive values).

Runs at sf0.001 for speed; tools/check_oracle.py runs the same comparison
at sf0.01 (the driver's scale) in the dev loop.
"""

from __future__ import annotations

import pytest

from i2mapreduce_spark.oracle import compare
from i2mapreduce_spark.queries import build_registry

QUERIES, ORACLES = build_registry()
HASH_KEYS = sorted(ORACLES)
ROWS_ONLY_KEYS = sorted(set(QUERIES) - set(ORACLES))


@pytest.mark.parametrize("key", HASH_KEYS)
def test_hash_parity(key, spark, duck, sf_dir):
    df = QUERIES[key](spark, sf_dir)
    res = compare(key, df, duck, ORACLES[key])
    assert res.ok, str(res)


@pytest.mark.parametrize("key", ROWS_ONLY_KEYS)
def test_rows_only_runs(key, spark, sf_dir):
    df = QUERIES[key](spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
