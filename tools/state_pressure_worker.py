"""Subprocess worker for the state-bigger-than-heap streaming test
(tests/test_state_pressure.py, r10 verdict item 3).

The RocksDB state-store provider is the engine's declared 100 TB state
backend (off-heap state + incremental changelog checkpointing —
streaming/stateful.py).  Crash recovery is already pinned
(tools/ckpt_recovery_worker.py); the remaining untested claim was the
reason RocksDB exists at all: keyed state LARGER than the executor
heap.  The HDFS-backed default provider keeps every partition's state
map as JVM objects on-heap, so state > heap is exactly where it stops
being an option.

This worker runs in a deliberately small-heap JVM (the test sets
I2MR_DRIVER_MEM, e.g. 600m — local mode, so driver heap IS the
executor heap) and drives the SAME applyInPandasWithState machinery as
the graded `stream_stateful_running` key through two verifications:

1. `padded`: the running-totals fold with the state row inflated by a
   16 KiB per-key pad, over N_KEYS distinct keys — logical keyed state
   (keys x state-row bytes) exceeds Runtime.maxMemory() by contract,
   which the worker asserts from inside the JVM.  Every key is touched
   by BOTH micro-batches, so batch 2 is a full read-merge-write pass
   over more-than-a-heap of preserved state.  RocksDB + changelog
   checkpointing must complete it and the final per-key totals must
   equal a DuckDB batch recompute over the delivered chunks.
2. `real`: the graded key's actual transform (running_totals_transform,
   un-padded) over the same keyed source at the same small heap —
   the production operator survives the constrained-memory config and
   matches the same batch recompute.

Success prints one `STATE-PRESSURE PASS ...` line per mode plus a JSON
metrics line (state bytes reported by the store, JVM max heap, rows).

Usage: python tools/state_pressure_worker.py WORKDIR [n_keys] [pad]
Env:   I2MR_DRIVER_MEM should be set small by the caller (else the
       8g default makes the > heap assertion fail loudly, by design).
"""

from __future__ import annotations

import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_KEYS = 120_000
PAD_BYTES = 16384
CHUNKS = 2
ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def _build_source(spark, stage_dir: str) -> None:
    """Two staged chunks; every key appears in both (values differ so a
    dropped merge is a VALUE error, not just a count error)."""
    from pyspark.sql import functions as F

    for i in range(CHUNKS):
        (
            spark.range(N_KEYS)
            .select(
                F.col("id").alias("user_id"),
                (F.pmod(F.col("id"), F.lit(97)) * (0.5 + i)).alias("value"),
            )
            .repartition(8)
            .write.mode("overwrite")
            .parquet(os.path.join(stage_dir, f"chunk-{i}"))
        )


def _deliver(stage_dir: str, src_dir: str, i: int) -> None:
    staged = os.path.join(stage_dir, f"chunk-{i}")
    for j, f in enumerate(sorted(os.listdir(staged))):
        if f.endswith(".parquet"):
            shutil.copy(
                os.path.join(staged, f),
                os.path.join(src_dir, f"chunk-{i}-{j}.parquet"),
            )


def _padded_transform(stream):
    """The `_running_totals` fold (streaming/stateful.py) with the state
    row inflated by PAD_BYTES — same read-merge-write cycle per key,
    state sized to exceed the test heap at N_KEYS."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        DoubleType, LongType, StringType, StructField, StructType,
    )

    state_schema = StructType([
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("pad", StringType()),
    ])
    out_schema = StructType([
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ])

    def fold(key, pdf_iter, state: GroupState):
        if state.exists:
            n, total, pad = state.get
        else:
            # INCOMPRESSIBLE pad (r11 smoke lesson): a constant pad
            # compressed to a 22 MB SST, so nothing physical ever
            # exceeded the heap; random bytes make the stored state
            # genuinely ~N_KEYS x PAD_BYTES on disk and in block cache
            import os as _os
            n, total, pad = 0, 0.0, _os.urandom(PAD_BYTES // 2).hex()
        for pdf in pdf_iter:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total, pad))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    return stream.groupBy("user_id").applyInPandasWithState(
        fold,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def _run_mode(spark, mode: str, workdir: str, stage_dir: str) -> dict:
    from pyspark.sql import functions as F

    from i2mapreduce_spark.streaming.stateful import running_totals_transform

    src = os.path.join(workdir, f"src-{mode}")
    ckpt = os.path.join(workdir, f"ckpt-{mode}")
    sink = os.path.join(workdir, f"sink-{mode}")
    for d in (src, ckpt, sink):
        os.makedirs(d, exist_ok=True)

    def write_batch(batch_df, batch_id):
        batch_df.withColumn("batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(sink)

    stream = spark.readStream.schema("user_id long, value double").parquet(src)
    transform = (
        _padded_transform(stream) if mode == "padded"
        else running_totals_transform(stream)
    )
    q = (
        transform.writeStream.outputMode("update")
        .foreachBatch(write_batch)
        .option("checkpointLocation", ckpt)
        .start()
    )
    for i in range(CHUNKS):
        _deliver(stage_dir, src, i)
        q.processAllAvailable()
    progress = q.lastProgress
    q.stop()

    state_op = (progress or {}).get("stateOperators", [{}])[0]
    return {
        "mode": mode,
        "sink": sink,
        "num_state_rows": state_op.get("numRowsTotal"),
        "state_memory_bytes": state_op.get("memoryUsedBytes"),
        "custom_metrics": {
            k: v
            for k, v in (state_op.get("customMetrics") or {}).items()
            if "Memory" in k or "SstFileSize" in k or "Pinned" in k
        },
    }


def _verify_sink(sink: str, stage_dir: str, mode: str) -> int:
    import duckdb

    con = duckdb.connect()
    got = con.execute(
        f"""
        WITH dedup AS (
            SELECT DISTINCT user_id, batch_id, n_events,
                   round(total_value, 2) AS total_value
            FROM read_parquet('{sink}/*.parquet')
        )
        SELECT user_id, n_events, total_value FROM dedup
        QUALIFY row_number() OVER (
            PARTITION BY user_id ORDER BY batch_id DESC
        ) = 1
        ORDER BY user_id
        """
    ).fetchall()
    want = con.execute(
        f"""
        SELECT user_id, count(*) AS n_events,
               round(sum(value), 2) AS total_value
        FROM read_parquet('{stage_dir}/chunk-*/*.parquet')
        GROUP BY user_id ORDER BY user_id
        """
    ).fetchall()
    con.close()
    assert len(got) == len(want) == N_KEYS, (
        f"{mode}: {len(got)} emitted vs {len(want)} expected vs {N_KEYS}"
    )
    bad = [(g, w) for g, w in zip(got, want) if g != w]
    assert not bad, f"{mode}: {len(bad)} value diffs; first: {bad[:3]}"
    return len(got)


def main() -> None:
    workdir = sys.argv[1]
    global N_KEYS, PAD_BYTES
    if len(sys.argv) > 2:
        N_KEYS = int(sys.argv[2])
    if len(sys.argv) > 3:
        PAD_BYTES = int(sys.argv[3])

    from i2mapreduce_spark.session import get_spark

    spark = get_spark(app_name="state-pressure", shuffle_partitions=4)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass", ROCKSDB
    )
    spark.conf.set(
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
        "true",
    )
    # Arrow state-transfer batches are DIRECT (off-heap) buffers sized
    # records x state-row bytes PER CONCURRENT TASK; at 16 KiB state
    # rows the default 10k-record batches put ~160 MB in flight per
    # task and netty's direct pool (capped near the heap size) dies
    # with Failure-allocating-buffer long before the state store is
    # touched (measured on the first smoke run).  Bounding the batch
    # size is the same lever a real cluster pulls for fat state rows —
    # throughput knob only, zero effect on state semantics.
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "1000")

    max_heap = int(
        spark._jvm.java.lang.Runtime.getRuntime().maxMemory()  # noqa: SLF001
    )
    logical_state = N_KEYS * (PAD_BYTES + 24)
    assert logical_state > max_heap, (
        f"fixture does not exercise the claim: logical state "
        f"{logical_state / 1e6:.0f} MB must exceed the JVM max heap "
        f"{max_heap / 1e6:.0f} MB — set I2MR_DRIVER_MEM smaller or "
        f"raise n_keys/pad"
    )

    stage_dir = os.path.join(workdir, "stage")
    os.makedirs(stage_dir, exist_ok=True)
    _build_source(spark, stage_dir)

    for mode in ("padded", "real"):
        stats = _run_mode(spark, mode, workdir, stage_dir)
        n = _verify_sink(stats.pop("sink"), stage_dir, mode)
        rt = spark._jvm.java.lang.Runtime.getRuntime()  # noqa: SLF001
        stats.update({
            "jvm_max_heap": max_heap,
            "jvm_used_heap": int(rt.totalMemory() - rt.freeMemory()),
            "logical_state_bytes": logical_state if mode == "padded" else None,
            "verified_keys": n,
        })
        print("METRICS " + json.dumps(stats), flush=True)
        if mode == "padded":
            # the physical proof: the state the store actually holds
            # (incompressible pad -> SST bytes ~ logical bytes) must
            # itself exceed the JVM heap, or the run demonstrated
            # nothing an on-heap provider couldn't also survive
            sst = int(stats["custom_metrics"].get("rocksdbSstFileSize", 0))
            assert sst > max_heap, (
                f"physical state (SST {sst / 1e6:.0f} MB) did not exceed "
                f"the heap ({max_heap / 1e6:.0f} MB)"
            )
        print(
            f"STATE-PRESSURE PASS mode={mode} keys={n} "
            f"heap={max_heap // (1 << 20)}m", flush=True,
        )


if __name__ == "__main__":
    main()
