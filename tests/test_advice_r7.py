"""Round-7 regression tests for the r6 ADVICE findings:

1. scc() must not silently drop nodes when the pass cap is hit — it
   raises on non-convergence and fully labels a trim-immune chain of
   2-cycles (one FW-BW pass per cycle) under the default cap.
2. scc() on an empty edge frame returns an empty (node, scc) frame
   instead of IndexError.
3. global_running_max_excl() must not truncate non-integer maxima: the
   partition-offset literal is cast to the max column's own type.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from i2mapreduce_spark.operators.algorithms import scc
from i2mapreduce_spark.operators.ranking import global_running_max_excl


def _chain_of_two_cycles(spark, n_cycles: int):
    """Directed chain of 2-cycles with ids increasing along the chain:
    nodes 2i <-> 2i+1 form cycle i, plus a bridge 2i+1 -> 2i+2.  Every
    node has in-degree and out-degree >= 1, so trimming removes nothing,
    and FW-BW coloring resolves exactly ONE cycle per pass (the one
    holding the current minimum id) — the adversarial topology from the
    r6 advice."""
    rows = []
    for i in range(n_cycles):
        a, b = 2 * i, 2 * i + 1
        rows.append((a, b))
        rows.append((b, a))
        if i + 1 < n_cycles:
            rows.append((b, a + 2))
    return spark.createDataFrame(rows, "src long, dst long")


def test_scc_raises_on_pass_cap_instead_of_partial(spark):
    # pass 1 resolves only the minimum's cycle (the whole graph is one
    # (f, b) class at the start), so a 1-pass cap must fail loudly on a
    # 4-cycle chain rather than return a partial labeling
    edges = _chain_of_two_cycles(spark, n_cycles=4)
    with pytest.raises(RuntimeError, match="passes exhausted"):
        scc(edges, max_passes=1)


def test_scc_chain_of_two_cycles_fully_labeled(spark):
    n = 5
    edges = _chain_of_two_cycles(spark, n_cycles=n)
    got = {
        (r["node"], r["scc"]) for r in scc(edges, max_passes=n + 1).collect()
    }
    want = {(2 * i + j, 2 * i) for i in range(n) for j in (0, 1)}
    assert got == want


def test_scc_class_splitting_resolves_chain_in_two_passes(spark):
    # r12: after pass 1, every unresolved cycle i sits in its own
    # (f, b) = (2i, 0) class and the bridge edges (cross-class) are
    # dropped, so pass 2 resolves ALL remaining cycles at once — the
    # r6-r11 shape needed one pass per cycle.  Same labels either way
    # (min-label fixpoints are unique); this pins the pass complexity.
    n = 6
    edges = _chain_of_two_cycles(spark, n_cycles=n)
    got = {(r["node"], r["scc"]) for r in scc(edges, max_passes=2).collect()}
    want = {(2 * i + j, 2 * i) for i in range(n) for j in (0, 1)}
    assert got == want


def test_scc_empty_edges_returns_empty_frame(spark):
    edges = spark.createDataFrame([], "src long, dst long")
    out = scc(edges)
    assert out.columns == ["node", "scc"]
    assert out.count() == 0


def test_global_running_max_excl_preserves_double_offsets(spark):
    # values chosen so the cross-partition offset is non-integral: a
    # long-cast offset would floor 3.5 -> 3 and corrupt later rows
    rows = [(i, v) for i, v in enumerate([1.5, 3.5, 2.25, 0.5, 3.25, 9.75])]
    df = spark.createDataFrame(rows, "ord long, v double")
    out = global_running_max_excl(
        df, ["ord"], "v", out_col="pre", num_partitions=3
    )
    got = {r["ord"]: r["pre"] for r in out.collect()}
    assert got == {
        0: None,
        1: 1.5,
        2: 3.5,
        3: 3.5,
        4: 3.5,
        5: 3.5,
    }
    # type is preserved, not silently widened/truncated
    assert dict(out.dtypes)["pre"] == "double"
