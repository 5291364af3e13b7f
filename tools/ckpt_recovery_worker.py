"""Subprocess worker for the streaming checkpoint-recovery test
(tests/test_checkpoint_recovery.py, r9 verdict item 2).

Simulates the durability half of the reference's MRBG-Store (A11): a
stateful streaming query (applyInPandasWithState running per-user
totals) is killed MID-STREAM — SIGKILL to the JVM, no q.stop(), no
cleanup — and a FRESH process resumes from the same checkpoint
directory.  The resumed query must (a) continue the micro-batch
numbering (proof it recovered the offset log instead of re-reading the
source from scratch) and (b) end with per-user state equal to a batch
recompute over all chunks (proof the keyed state survived the crash).

Phases (each its own process — that is the point):
  phase1 WORKDIR PROVIDER : build 4 chronological event chunks, feed
      chunks 0-1 as two committed micro-batches, then kill the JVM with
      SIGKILL and _exit(42).
  phase2 WORKDIR PROVIDER : restart from the same checkpoint, feed
      chunks 2-3, stop gracefully, verify continuity + state vs the
      batch recompute written by phase1.  Prints CKPT-RECOVERY PASS.

PROVIDER is `hdfs` (default HDFSBackedStateStoreProvider) or `rocksdb`
(RocksDBStateStoreProvider — the 100 TB state path: off-heap state,
incremental changelog checkpointing).
"""

from __future__ import annotations

import glob
import os
import shutil
import signal
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PROVIDERS = {
    "hdfs": "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider",
    "rocksdb": "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
}
N_CHUNKS = 4
CHUNK_SCHEMA = "user_id long, value double"


def _paths(workdir: str) -> dict:
    return {
        "stage": os.path.join(workdir, "stage"),
        "src": os.path.join(workdir, "src"),
        "ckpt": os.path.join(workdir, "ckpt"),
        "sink": os.path.join(workdir, "sink"),
        "expected": os.path.join(workdir, "expected"),
    }


def _sink_fn(sink_dir: str):
    from pyspark.sql import functions as F

    def write_batch(batch_df, batch_id):
        # foreachBatch is at-least-once: a replayed batch re-appends
        # rows under the SAME batch_id; the reader dedupes on
        # (user_id, batch_id), so the sink stays idempotent.
        batch_df.withColumn("batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(sink_dir)

    return write_batch


def _start_query(spark, p, provider: str):
    from i2mapreduce_spark.streaming.stateful import running_totals_transform

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass", PROVIDERS[provider]
    )
    stream = spark.readStream.schema(CHUNK_SCHEMA).parquet(p["src"])
    return (
        running_totals_transform(stream)
        .writeStream.outputMode("update")
        .foreachBatch(_sink_fn(p["sink"]))
        .option("checkpointLocation", p["ckpt"])
        .start()
    )


def _deliver_chunk(p, i: int) -> None:
    """Move one staged chunk's part-files into the live source dir (the
    A12 delta-arrival event the file source watches for)."""
    staged = os.path.join(p["stage"], f"chunk-{i}")
    for j, f in enumerate(sorted(os.listdir(staged))):
        if f.endswith(".parquet"):
            shutil.copy(
                os.path.join(staged, f),
                os.path.join(p["src"], f"chunk-{i}-{j}.parquet"),
            )


def _sink_batch_counts(sink_dir: str) -> dict[int, int]:
    import duckdb

    if not glob.glob(os.path.join(sink_dir, "*.parquet")):
        return {}
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT batch_id, count(*) FROM read_parquet('{sink_dir}/*.parquet') "
        "GROUP BY 1"
    ).fetchall()
    con.close()
    return {int(b): int(n) for b, n in rows}


def _kill_own_jvm(spark) -> None:
    """SIGKILL the gateway JVM — a crash, not a shutdown: no stop(), no
    checkpoint finalization, no JVM shutdown hooks."""
    proc = getattr(spark.sparkContext._gateway, "proc", None)
    if proc is not None:
        proc.kill()  # SIGKILL to spark-submit/java
        return
    # fallback: scan /proc for our direct java children
    me = str(os.getpid())
    for stat in glob.glob("/proc/[0-9]*/stat"):
        try:
            parts = open(stat).read().split()
            if parts[3] == me and "java" in parts[1]:
                os.kill(int(parts[0]), signal.SIGKILL)
        except (OSError, IndexError):
            continue


def phase1(workdir: str, provider: str) -> None:
    from pyspark.sql import functions as F

    from i2mapreduce_spark.catalog import load_tables
    from i2mapreduce_spark.session import get_spark
    from i2mapreduce_spark.streaming.incremental import chunk_events

    p = _paths(workdir)
    for d in p.values():
        os.makedirs(d, exist_ok=True)
    sf_dir = os.environ.get("I2MR_TEST_SF_DIR", "/root/testdata/sf0.001")
    spark = get_spark(app_name=f"ckpt-recovery-{provider}", shuffle_partitions=8)
    load_tables(spark, sf_dir)
    ev = spark.table("events")
    for i, c in enumerate(chunk_events(spark, ev, n=N_CHUNKS)):
        c.select("user_id", "value").write.parquet(
            os.path.join(p["stage"], f"chunk-{i}")
        )
    # ground truth: from-scratch batch recompute over ALL events — what
    # the recovered state must equal after every chunk has streamed in
    (
        ev.groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .write.mode("overwrite")
        .parquet(p["expected"])
    )

    _deliver_chunk(p, 0)
    q = _start_query(spark, p, provider)
    q.processAllAvailable()  # micro-batch 0 commits
    _deliver_chunk(p, 1)
    q.processAllAvailable()  # micro-batch 1 commits
    got = _sink_batch_counts(p["sink"])
    assert sorted(got) == [0, 1], f"phase1 expected batches 0,1 — got {got}"

    _kill_own_jvm(spark)
    os._exit(42)  # crash exit: no atexit, no py4j shutdown, no cleanup


def phase2(workdir: str, provider: str) -> None:
    import duckdb

    from i2mapreduce_spark.session import get_spark

    p = _paths(workdir)
    pre = _sink_batch_counts(p["sink"])
    assert pre, "phase2 found an empty sink — phase1 did not run"
    spark = get_spark(app_name=f"ckpt-recovery-{provider}-resume", shuffle_partitions=8)
    q = _start_query(spark, p, provider)
    q.processAllAvailable()  # recover + replay any uncommitted batch
    _deliver_chunk(p, 2)
    q.processAllAvailable()
    _deliver_chunk(p, 3)
    q.processAllAvailable()
    q.stop()

    post = _sink_batch_counts(p["sink"])
    new_ids = sorted(set(post) - set(pre))
    # (a) offset-log continuity: the resumed query continues numbering
    # where the crashed one stopped — a from-scratch query would restart
    # at batch 0 and re-read chunks 0-1 (growing their counts instead)
    assert new_ids and min(new_ids) >= max(pre), (
        f"resume did not continue batch numbering: pre={pre} post={post}"
    )
    for bid, n in pre.items():
        # only the final pre-crash batch may be replayed (at-least-once)
        assert post[bid] == n or bid == max(pre), (
            f"batch {bid} was re-emitted after resume: pre={pre} post={post}"
        )

    # (b) state continuity: latest emission per user == batch recompute
    con = duckdb.connect()
    final = con.execute(
        f"""
        WITH dedup AS (
            -- round BEFORE DISTINCT (r10 advice): a replayed final
            -- pre-crash batch may recompute sums in a different order,
            -- and two rows for the same (user_id, batch_id) that
            -- differ only in float LSBs must collapse to one here, not
            -- survive to an arbitrary QUALIFY tie-break
            SELECT DISTINCT user_id, batch_id, n_events,
                   round(total_value, 2) AS total_value
            FROM read_parquet('{p["sink"]}/*.parquet')
        )
        SELECT user_id, n_events, total_value
        FROM dedup
        QUALIFY row_number() OVER (
            PARTITION BY user_id ORDER BY batch_id DESC
        ) = 1
        """
    ).fetchall()
    expected = con.execute(
        f"SELECT user_id, n_events, total_value "
        f"FROM read_parquet('{p['expected']}/*.parquet')"
    ).fetchall()
    con.close()
    got = {u: (n, t) for u, n, t in final}
    want = {u: (n, t) for u, n, t in expected}
    assert got == want, (
        f"recovered state != batch recompute: {len(got)} vs {len(want)} users; "
        f"first diffs: "
        f"{[(u, got.get(u), want.get(u)) for u in list(set(got) ^ set(want) or [u for u in want if got.get(u) != want[u]])[:3]]}"
    )
    print(
        f"CKPT-RECOVERY PASS provider={provider} users={len(got)} "
        f"batches={sorted(post)} resumed_at={min(new_ids)}"
    )


def main() -> None:
    phase, workdir, provider = sys.argv[1], sys.argv[2], sys.argv[3]
    assert provider in PROVIDERS, f"unknown provider {provider}"
    {"phase1": phase1, "phase2": phase2}[phase](workdir, provider)


if __name__ == "__main__":
    main()
