"""Distributed total-order ranking without a single-partition window.

An unpartitioned ``Window.orderBy(...)`` moves EVERY row to one task —
the classic scale-killer Spark itself warns about ("No Partition Defined
for Window operation").  For a unique total order the global rank is
computable fully distributed with the chunked-offset construction the
incremental engine already uses for deterministic event chunking
(streaming/incremental.py:chunk_events):

1. ``repartitionByRange`` on the order key — rows land in globally
   ordered, parallel range partitions;
2. per-partition ``row_number`` — parallel, partition-local sort only;
3. add the cumulative row count of all earlier partitions — one
   n_partitions-row aggregate collected to the driver (bounded: one long
   per partition, independent of data size).

Because the order key is a UNIQUE total order, the result is
bit-identical to ``row_number() OVER (ORDER BY ...)`` regardless of
where the range boundaries land.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["global_row_number", "global_running_sum"]


def global_row_number(
    df: DataFrame,
    order_cols: list[str],
    out_col: str = "i",
    num_partitions: int | None = None,
) -> DataFrame:
    """Append 1-based global ``row_number`` under ``order_cols`` (must be
    a unique total order for determinism) as ``out_col``.

    Scale: the only global coordination is the per-partition-count
    collect (``num_partitions`` longs); everything row-wise stays
    parallel.  The input is localCheckpointed once to pin partition ids
    to the data (at 100 TB use reliable checkpoint()/a persisted stage
    boundary instead — same call site).
    """
    if num_partitions is None:
        n_conf = df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
        num_partitions = int(n_conf)
    ranged = (
        df.repartitionByRange(num_partitions, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)  # pin partition ids with the data
    )
    counts = {
        r["_pid"]: r["cnt"]
        for r in ranged.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off_expr = F.element_at(
        F.create_map(
            *[F.lit(x) for pid in sorted(offsets) for x in (pid, offsets[pid])]
        ),
        F.col("_pid"),
    )
    wp = Window.partitionBy("_pid").orderBy(*order_cols)
    return ranged.withColumn(
        out_col, (F.row_number().over(wp) + off_expr).cast("long")
    ).drop("_pid")


def global_running_sum(
    df: DataFrame,
    order_cols: list[str],
    sum_cols: list[str],
    num_partitions: int | None = None,
) -> DataFrame:
    """Append running ``SUM(c)`` for each ``c`` in ``sum_cols`` under the
    unique total order ``order_cols`` as ``cum_<c>`` — the prefix-sum
    twin of :func:`global_row_number`, and the distributed replacement
    for an unpartitioned cumulative window:

    1. range-partition + sort locally (parallel);
    2. per-partition RUNNING sums (parallel, partition-local);
    3. add the total of all earlier partitions — one bounded collect of
       ``num_partitions`` partial sums per column, independent of rows.

    Identical to ``SUM(c) OVER (ORDER BY ... ROWS UNBOUNDED PRECEDING)``
    for any placement of the range boundaries, because integer/decimal
    addition is associative (use only exact-typed columns here — float
    prefix sums would be boundary-dependent).
    """
    if num_partitions is None:
        n_conf = df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
        num_partitions = int(n_conf)
    ranged = (
        df.repartitionByRange(num_partitions, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)  # pin partition ids with the data
    )
    totals = {
        r["_pid"]: r
        for r in ranged.groupBy("_pid")
        .agg(*[F.sum(c).alias(c) for c in sum_cols])
        .collect()
    }
    out = ranged
    wp = (
        Window.partitionBy("_pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    for c in sum_cols:
        offsets, acc = {}, 0
        for pid in sorted(totals):
            offsets[pid] = acc
            acc += totals[pid][c] or 0
        off_expr = F.element_at(
            F.create_map(
                *[F.lit(x) for pid in sorted(offsets) for x in (pid, offsets[pid])]
            ),
            F.col("_pid"),
        )
        out = out.withColumn(f"cum_{c}", (F.sum(c).over(wp) + off_expr).cast("long"))
    return out.drop("_pid")


def global_running_max_excl(
    df: DataFrame,
    order_cols: list[str],
    max_col: str,
    out_col: str = "pre_max",
    num_partitions: int | None = None,
) -> DataFrame:
    """Append the EXCLUSIVE running ``MAX(max_col)`` under the unique
    total order ``order_cols`` — the max over all STRICTLY EARLIER rows
    (NULL for the global first row), i.e.
    ``MAX(c) OVER (ORDER BY ... ROWS BETWEEN UNBOUNDED PRECEDING AND 1
    PRECEDING)`` without the single-partition window.  Same chunked
    scheme as :func:`global_running_sum` (max is associative too):
    range-partition, partition-local exclusive running max, then fold in
    the max of all earlier partitions via one bounded collect."""
    if num_partitions is None:
        n_conf = df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
        num_partitions = int(n_conf)
    ranged = (
        df.repartitionByRange(num_partitions, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)  # pin partition ids with the data
    )
    totals = {
        r["_pid"]: r["mx"]
        for r in ranged.groupBy("_pid").agg(F.max(max_col).alias("mx")).collect()
    }
    offsets, acc = {}, None
    for pid in sorted(totals):
        offsets[pid] = acc  # max over all EARLIER partitions (None if none)
        t = totals[pid]
        acc = t if acc is None or (t is not None and t > acc) else acc
    wp = (
        Window.partitionBy("_pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # cast offsets to max_col's own type: a hard 'long' cast would
    # silently truncate double/decimal maxima
    val_type = ranged.schema[max_col].dataType
    off_expr = F.element_at(
        F.create_map(
            *[
                c
                for pid in sorted(offsets)
                # explicit cast: the first partition's offset is None and
                # a bare NULL literal would break map value-type inference
                for c in (F.lit(pid), F.lit(offsets[pid]).cast(val_type))
            ]
        ),
        F.col("_pid"),
    )
    local = F.max(max_col).over(wp)
    return ranged.withColumn(out_col, F.greatest(local, off_expr)).drop("_pid")
