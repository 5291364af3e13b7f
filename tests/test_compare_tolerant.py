"""compare_tolerant (r10 verdict item 6) must be a real gate, not a
rubber stamp: the extreme-magnitude sweep leg replaced its six
rows-only demotions with value checks at explicit tolerances, and this
file pins that the checker (a) passes documented sub-precision drift,
(b) still fails every defect class a rows-only check would have let
through — wrong value, wrong group label, sign flip, row-count drift,
schema drift, NaN asymmetry."""

from __future__ import annotations

import duckdb
import pytest

from i2mapreduce_spark.oracle import compare_tolerant


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    yield c
    c.close()


def _spark_like(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_sub_precision_drift_passes(spark, con):
    # 1-ulp-class relative drift (1e-15) at 1e16 magnitude — the exact
    # regime of the sf001big demotions
    df = _spark_like(spark, [("a", 1.0000000000000002e16), ("b", 2e16)],
                     "k string, v double")
    res = compare_tolerant(
        "t", df, con, "SELECT 'a' AS k, 1e16 AS v UNION ALL "
        "SELECT 'b' AS k, 2e16 AS v", rtol=1e-12)
    assert res.ok, res


def test_wrong_value_fails(spark, con):
    df = _spark_like(spark, [("a", 1.1e16), ("b", 2e16)],
                     "k string, v double")
    res = compare_tolerant(
        "t", df, con, "SELECT 'a' AS k, 1e16 AS v UNION ALL "
        "SELECT 'b' AS k, 2e16 AS v", rtol=1e-12)
    assert not res.ok


def test_sign_flip_fails(spark, con):
    df = _spark_like(spark, [("a", -1e16)], "k string, v double")
    res = compare_tolerant("t", df, con, "SELECT 'a' AS k, 1e16 AS v",
                           rtol=1e-12)
    assert not res.ok


def test_wrong_group_label_fails(spark, con):
    df = _spark_like(spark, [("WRONG", 1e16)], "k string, v double")
    res = compare_tolerant("t", df, con, "SELECT 'a' AS k, 1e16 AS v",
                           rtol=1e-12)
    assert not res.ok


def test_row_count_drift_fails(spark, con):
    df = _spark_like(spark, [("a", 1e16), ("b", 2e16)],
                     "k string, v double")
    res = compare_tolerant("t", df, con, "SELECT 'a' AS k, 1e16 AS v",
                           rtol=1e-12)
    assert not res.ok
    assert "row count" in "; ".join(res.notes)


def test_schema_drift_fails(spark, con):
    df = _spark_like(spark, [("a", 1e16)], "k string, wrong double")
    res = compare_tolerant("t", df, con, "SELECT 'a' AS k, 1e16 AS v",
                           rtol=1e-12)
    assert not res.ok


def test_nan_asymmetry_fails_and_nan_pair_passes(spark, con):
    df = _spark_like(spark, [("a", float("nan"))], "k string, v double")
    assert compare_tolerant(
        "t", df, con, "SELECT 'a' AS k, 'nan'::DOUBLE AS v", rtol=1e-12
    ).ok
    assert not compare_tolerant(
        "t", df, con, "SELECT 'a' AS k, 1.0 AS v", rtol=1e-12
    ).ok


def test_within_tolerance_rows_align_despite_float_sort(spark, con):
    # two rows share the non-float key; each side's floats sort
    # independently so near-equal values align positionally
    df = _spark_like(spark, [("a", 1.0 + 1e-15), ("a", 2.0)],
                     "k string, v double")
    res = compare_tolerant(
        "t", df, con, "SELECT 'a' AS k, 2.0 AS v UNION ALL "
        "SELECT 'a' AS k, 1.0 AS v", rtol=1e-12)
    assert res.ok, res
