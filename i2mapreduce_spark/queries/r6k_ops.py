"""Round-6 additions, batch 11: streaming last-touch attribution — the
custom-stateful (applyInPandasWithState) twin of `window_attribution`,
proving the stream and batch forms of the same business query agree
exactly (SURVEY §5.2 stream-batch equivalence, over preserved per-user
state instead of a window).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..catalog import load_tables
from ..streaming.incremental import chunk_events, stream_over_chunks
from .r6j_ops import ATTR_WINDOW_H, ORACLES as _R6J_ORACLES

_ATTR_STATE = StructType([StructField("last_click_us", LongType())])
_ATTR_OUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("day", StringType()),
        StructField("cents", LongType()),
        StructField("attr", IntegerType()),
    ]
)
_ATTR_US = ATTR_WINDOW_H * 3600 * 1_000_000


def _attr_fn(key, pdf_iter, state: GroupState):
    """Per-user keyed state = the latest click timestamp (µs).  Each
    micro-batch is sorted on (ts, event_id) and the carry-forward is a
    VECTORIZED cummax of click timestamps seeded from preserved state —
    no per-row python; purchases emit (day, cents, attributed)."""
    last = state.get[0] if state.exists else None
    for pdf in pdf_iter:
        if len(pdf) == 0:
            continue
        pdf = pdf.sort_values(["ts", "event_id"]).reset_index(drop=True)
        us = pdf["ts"].astype("int64") // 1000  # ns -> µs, tz-less
        clicks = us.where(pdf["event_type"] == "click").astype("float64")
        # strictly-before semantics: shift(1) excludes the current row
        # (its position 0 is always NaN, so the preserved cross-batch
        # state seeds it), then ffill carries the latest click forward —
        # rows are ts-sorted, so last-click == max-click, and ffill is
        # the correct carry (pandas cummax(skipna=True) yields NaN AT
        # NaN positions, which silently dropped attributions here)
        carried = clicks.shift(1)
        if last is not None:
            carried.iloc[0] = float(last)
        carried = carried.ffill()
        is_p = (pdf["event_type"] == "purchase").to_numpy()
        if is_p.any():
            p_us = us[is_p]
            p_carried = carried[is_p]
            attr = (
                p_carried.notna()
                & ((p_us - p_carried) <= _ATTR_US)
            ).astype("int32")
            yield pd.DataFrame(
                {
                    # nullable Int64: the NULL-user group is a real keyed
                    # group here (window PARTITION BY semantics in the
                    # batch oracle group NULLs together), and its user_id
                    # arrives as NaN — plain int64 astype would throw
                    "user_id": pdf["user_id"][is_p].astype("Int64"),
                    "day": pdf["ts"][is_p].dt.strftime("%Y-%m-%d"),
                    # nullable Int64: a purchase with no recorded value
                    # still counts, its cents stay NULL (plain int64
                    # astype would throw on the NaN) — the downstream
                    # sum skips NULLs exactly like the batch oracle's
                    # CASE/sum
                    "cents": pdf["cents"][is_p].astype("Int64"),
                    "attr": attr,
                }
            )
        mx = clicks.max()
        if pd.notna(mx):
            last = int(mx) if last is None else max(last, int(mx))
    state.update((last,))


def q_stream_attribution(spark, sf_dir):
    """Streaming last-touch attribution: events arrive in 3
    chronological micro-batches; per-user keyed state preserves the
    latest click across batches (applyInPandasWithState — the
    MRBG-style read-merge-write cycle), purchases are credited within
    the 24 h lookback as they arrive, and the memory-sink rows roll up
    to the same daily attach table as the batch key.  The oracle IS the
    batch oracle — stream and batch must hash identically."""
    load_tables(spark, sf_dir)
    e = spark.table("events").select(
        "user_id",
        "event_id",
        "event_type",
        "ts",
        (F.col("value").cast("decimal(18,2)") * 100).cast("long").alias("cents"),
    )
    chunks = chunk_events(spark, e, n=3)

    def transform(stream):
        return stream.groupBy("user_id").applyInPandasWithState(
            _attr_fn,
            outputStructType=_ATTR_OUT,
            stateStructType=_ATTR_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )

    sink = stream_over_chunks(
        spark, chunks, transform, "update", "stream_attr_sink"
    )
    daily = sink.groupBy("day").agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.sum("attr").alias("n_attributed"),
        F.sum(F.when(F.col("attr") == 1, F.col("cents")).otherwise(0)).alias(
            "ac"
        ),
    )
    return daily.select(
        "day",
        "n_purchases",
        F.col("n_attributed").cast("long").alias("n_attributed"),
        (F.col("ac") / 100.0).alias("attributed_revenue"),
        F.expr(
            "(2000 * n_attributed + n_purchases) div (2 * n_purchases)"
        ).alias("attach_pm"),
    )


QUERIES = {"stream_attribution": q_stream_attribution}

#: stream-batch equivalence: the ORACLE is the batch query's oracle.
ORACLES = {"stream_attribution": _R6J_ORACLES["window_attribution"]}
