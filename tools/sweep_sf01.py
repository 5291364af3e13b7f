"""Full-surface scale sweep: execute EVERY registry key once at sf0.1
(10x the correctness SF) in one warm session and report per-key seconds.

This is the regression harness SURVEY §6 describes: correctness runs at
sf0.01, so a key that silently grew a quadratic term still passes the
oracle gate — but its sf0.1/sf0.01 time ratio jumps past ~10x here.
Usage:

    python tools/sweep_sf01.py              # all keys at sf0.1
    python tools/sweep_sf01.py key1 key2    # just these keys
    SWEEP_SF_DIR=/root/testdata/sf0.01 python tools/sweep_sf01.py
    SWEEP_BASELINE=/path/to/prior.json \
        python tools/sweep_sf01.py          # + scripted ratio alarm

Prints one line per key (seconds + row count, ERR on failure), a sorted
slowest-20 summary, and writes per-key timings to $SWEEP_OUT (default
/tmp/sweep_times.json) so a later run at another SF can be compared.
When SWEEP_BASELINE points at a prior sweep's JSON from a 10x-smaller
SF, the ratio check is a scripted assertion (r6 verdict item 7), not a
prose rule: exit code 1 if any key errors OR any key whose baseline
time is >= MIN_BASE (0.5s — below that, scheduling noise dominates the
ratio) grew by more than SWEEP_MAX_RATIO (default 10x).

SWEEP_ALLOW (comma-separated keys) exempts declared-quadratic exact
baselines from the alarm — currently sim_topk_cosine (exact all-pairs
cosine; the sim_ann_* keys are its sub-quadratic replacements) and
dedup_near_jaccard (exact shingle-pair semantics oracle for
dedup_minhash_lsh).  Exempt keys are still timed and reported.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from i2mapreduce_spark.queries import build_registry  # noqa: E402
from i2mapreduce_spark.session import get_spark  # noqa: E402

#: baseline seconds under which a ratio is scheduling noise, not growth
MIN_BASE = 0.5

#: keys whose super-linear growth is their documented CONTRACT: they
#: enumerate EXACT near-dup/similarity pairs (or compose over that pair
#: set), so on a corpus with duplication factor D the true pair set —
#: and on the 10-copy sf1 stress fixture the OUTPUT itself — grows
#: ~D^2 (measured 256 -> 250,600 rows).  The bucketed scale paths
#: (dedup_minhash_lsh 4.2x, sim_ann_* <= 9.2x at the same 10x) are the
#: production route; these stay as the semantics oracles.
DEFAULT_ALLOW = ",".join([
    "sim_topk_cosine",            # exact all-pairs cosine kernel
    "dedup_near_jaccard",         # exact shingle-pair jaccard
    "dedup_containment",          # exact shingle-pair containment
    "dedup_ensemble_vote",        # union of the exact pair methods
    "dedup_embedding_cosine",     # exact cosine pairs + CC grouping
    "dedup_cluster_resolve",      # CC + resolution over the exact pair set
    "join_similarity_prefix_filter",  # exact sim join (output ~D^2)
    "pipeline_split_leakage_safe",    # splits over exact-jaccard clusters
])


def main() -> int:
    sf_dir = os.environ.get("SWEEP_SF_DIR", "/root/testdata/sf0.1")
    out_path = os.environ.get("SWEEP_OUT", "/tmp/sweep_times.json")
    base_path = os.environ.get("SWEEP_BASELINE")
    max_ratio = float(os.environ.get("SWEEP_MAX_RATIO", "10"))
    queries, _ = build_registry()
    if len(sys.argv) > 1:
        queries = {k: queries[k] for k in sys.argv[1:]}
    n_part = int(os.environ.get("SWEEP_PARTITIONS", "8"))
    # Propagate through the env var configure_session() reads: every
    # query key calls load_tables -> configure_session, which re-applies
    # shuffle partitions from I2MR_SHUFFLE_PARTITIONS (default 32) on
    # EVERY call — so a value passed only to get_spark() is silently
    # clobbered back to 32 before the first query runs.  (r11: found at
    # sf100 when the self-join stage kept sorting ~20M rows/task and
    # demanding 1 GB pages no matter what SWEEP_PARTITIONS said — the
    # recorded partition counts of earlier sweep files were aspirational,
    # not effective.)
    os.environ["I2MR_SHUFFLE_PARTITIONS"] = str(n_part)
    spark = get_spark(app_name="i2mr-sweep", shuffle_partitions=n_part)
    # The 100 TB memory knob (r9 verdict item 3): instead of growing the
    # heap with the input, cap scan-partition size so partition count
    # scales with input bytes and AQE coalescing shrinks it back where
    # the data is small.  SWEEP_MAX_PARTITION_BYTES exercises exactly
    # that configuration (e.g. 8 GiB heap + 32m partitions at sf10).
    mpb = os.environ.get("SWEEP_MAX_PARTITION_BYTES")
    if mpb:
        spark.conf.set("spark.sql.files.maxPartitionBytes", mpb)
    # The POST-shuffle twin of the knob above (r11 sf100 lesson):
    # raising spark.sql.shuffle.partitions alone does nothing under
    # AQE, which coalesces small partitions back to the 64 MB advisory
    # target — so per-task post-shuffle bytes stay constant while the
    # data grows 10x, and an 8-task/16g executor OOMs at the same
    # stage at 1024 AND 4096 configured partitions (a 64 MB compressed
    # edge partition decompresses + hash-builds to ~1 GB).  The
    # advisory size must track per-task execution memory, not the
    # default: ~16 MB for 8 tasks sharing a 16 GB heap at sf100.
    apb = os.environ.get("SWEEP_ADVISORY_PARTITION_BYTES")
    if apb:
        spark.conf.set(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes", apb)
    t_all = time.perf_counter()
    times: dict[str, float] = {}
    errs: dict[str, str] = {}
    for i, (key, fn) in enumerate(queries.items(), 1):
        t0 = time.perf_counter()
        try:
            n = fn(spark, sf_dir).count()
            dt = time.perf_counter() - t0
            times[key] = round(dt, 3)
            print(f"[{i:3d}/{len(queries)}] {key}: {dt:.2f}s {n} rows", flush=True)
        except Exception as e:  # noqa: BLE001 — sweep must survey everything
            errs[key] = f"{type(e).__name__}: {e}"
            print(f"[{i:3d}/{len(queries)}] {key}: ERR {errs[key][:200]}", flush=True)
    total = time.perf_counter() - t_all
    print(f"\n=== {len(times)}/{len(queries)} succeeded in {total:.1f}s ===")
    for key, dt in sorted(times.items(), key=lambda kv: -kv[1])[:20]:
        print(f"  slow: {key} {dt:.2f}s")
    # the session config that produced these timings, recorded so a
    # later re-probe can tell whether the recorded numbers are
    # comparable to its own session (r10 advice: min(recorded, fresh)
    # across DIFFERENT configs can false-alarm when the current config
    # speeds up the baseline SF)
    config = {"shuffle_partitions": n_part,
              "max_partition_bytes": mpb or None,
              # heap and task-slot count change per-task memory share,
              # so a baseline timed under a different executor shape
              # must not join the min-of-k pool either (r11: the sf100
              # leg mixed 8g- and 16g-heap readings before these were
              # recorded)
              "driver_memory": os.environ.get("I2MR_DRIVER_MEM", "8g"),
              "cpus": os.environ.get("SPARK_GRAFT_CPUS", "*"),
              "advisory_partition_bytes": apb or None,
              # r12: checkpoint storage level and shuffle codec change
              # both wall and spill, so mixed-config ratios must be
              # visible (a baseline timed deserialized/lz4 must not
              # silently join a serialized/zstd min-of-k pool)
              "ckpt_level": os.environ.get("I2MR_CKPT_LEVEL") or None,
              "io_codec": os.environ.get("I2MR_IO_CODEC") or None}
    json.dump({"sf_dir": sf_dir, "times": times, "config": config},
              open(out_path, "w"), indent=1)
    print(f"timings written to {out_path}")

    breaches: list[str] = []
    if base_path:
        allow = set(
            os.environ.get("SWEEP_ALLOW", DEFAULT_ALLOW).split(",")
        )
        base_doc = json.load(open(base_path))
        base = base_doc["times"]
        base_sf_dir = base_doc.get("sf_dir")
        # min-of-k adjudication (r9 verdict item 4): loop-heavy keys show
        # up to 7x run-to-run spread, so a single breaching reading used
        # to demand a hand-run interleaved re-probe (SWEEP_SF10.md §r9,
        # iter_connected_components).  The script now performs that
        # procedure itself: any breaching key is re-timed SWEEP_PROBES
        # times total, INTERLEAVED at the baseline SF and the sweep SF
        # in the same warm session, and the alarm fires only if
        # min(sweep)/min(base) still exceeds the gate.
        probes = int(os.environ.get("SWEEP_PROBES", "3"))
        # configs must match for the recorded baseline to join the
        # min-of-k pool: an interleaved fresh baseline is timed under
        # THIS session's partitioning, so min(recorded, fresh) across
        # different configs would compare a numerator and denominator
        # from different plans (r10 advice).  On mismatch the recorded
        # reading seeds the breach check only, not the adjudication min.
        base_config = base_doc.get("config")
        config_match = base_config == config
        if base_config is not None and not config_match:
            print(
                f"  note: baseline config {base_config} != current "
                f"{config}; re-probes will use same-session timings only"
            )
        for key, dt in times.items():
            b = base.get(key)
            if b is None or b < MIN_BASE or key in allow:
                continue
            if dt / b > max_ratio and probes > 1:
                best_hi = dt
                best_lo = b if config_match else float("inf")
                print(
                    f"  gate breach on first reading — re-probing {key} "
                    f"(min-of-{probes}, interleaved)",
                    flush=True,
                )
                for _ in range(probes - 1):
                    if base_sf_dir and os.path.isdir(base_sf_dir):
                        t0 = time.perf_counter()
                        queries[key](spark, base_sf_dir).count()
                        best_lo = min(best_lo, time.perf_counter() - t0)
                    t0 = time.perf_counter()
                    queries[key](spark, sf_dir).count()
                    best_hi = min(best_hi, time.perf_counter() - t0)
                if best_lo == float("inf"):
                    # config mismatch AND no baseline SF dir to re-time
                    # under this session: the recorded reading is the
                    # only denominator left — conservative (may still
                    # false-alarm), said out loud
                    print(
                        f"  warn: {key}: baseline SF dir unavailable; "
                        "using recorded baseline despite config mismatch"
                    )
                    best_lo = b
                print(
                    f"  re-probe {key}: base {b:.2f}->{best_lo:.2f}s, "
                    f"sweep {dt:.2f}->{best_hi:.2f}s "
                    f"(ratio {dt / b:.1f}x -> {best_hi / best_lo:.1f}x)",
                    flush=True,
                )
                times[key], b = round(best_hi, 3), best_lo
                dt = best_hi
            ratio = dt / b
            if ratio > max_ratio:
                breaches.append(f"{key}: {b:.2f}s -> {dt:.2f}s ({ratio:.1f}x)")
        json.dump({"sf_dir": sf_dir, "times": times, "config": config},
                  open(out_path, "w"), indent=1)
        if breaches:
            print(f"RATIO BREACHES (> {max_ratio}x vs {base_path}, min-of-{probes}):")
            for line in breaches:
                print(f"  {line}")
        else:
            print(
                f"ratio check vs {base_path}: all keys <= {max_ratio}x "
                f"(breaches adjudicated min-of-{probes})"
            )
    if errs:
        print(f"ERRORS ({len(errs)}):")
        for key, msg in errs.items():
            print(f"  {key}: {msg}")
    return 1 if (errs or breaches) else 0


if __name__ == "__main__":
    raise SystemExit(main())
