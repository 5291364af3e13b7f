#!/bin/sh
# local[8]x8g leg of the sf100 canary — the execution-share shape of a
# REAL 8 GiB executor (4-8 cores), established in SWEEP_SF10.md §r10
# for iter_connected_components.  At sf100 the same per-task
# execution-memory arithmetic catches the other heavy fixpoints too:
# 32 concurrent tasks in one 8 GiB JVM give each task ~75 MB of the
# unified pool, and iter_scc / iter_triangle_count OOM'd local[32]x8g
# at sf100 exactly as CC did at sf10 (the triangle failure surfaces as
# a follow-on NPE after SparkUncaughtExceptionHandler takes the
# executor down).  8 tasks per 8 GiB is the ratio a real cluster runs;
# partitions stay input-scaled.  Same per-key process isolation +
# config recording as tools/sweep_sf100.sh.
#
# Default KEYS = every heavy fixpoint displaced from the local[32] leg
# (iter_scc/triangle/mst/pagerank all exhaust per-task execution memory
# there at sf100) plus CC, the §r10 local[8] exemplar.  Ordered
# fastest-first so an interrupted run still leaves usable per-key JSONs.
set -e
cd "$(dirname "$0")/.."
SF10=${SF10:-/tmp/testdata/sf10}
SF100=${SF100:-/tmp/testdata/sf100}
export I2MR_DRIVER_MEM=${I2MR_DRIVER_MEM:-8g}
export SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-8}
# disk-only loop checkpoints: deserialized unrolls OOM the 8 GiB heap
# at sf100 (iter_scc: PrimitiveVector.resize JVM OOM), and even
# serialized in-memory blocks hold the unified pool's storage floor —
# iter_pagerank's sf100 join died UNABLE_TO_ACQUIRE_MEMORY with
# MEMORY_AND_DISK(SER) checkpoints (both r12, logs in
# /tmp/sweep_sf100_cc_r12.log + r12_pr_sf100.log).  DISK_ONLY frees
# the whole pool for execution; checkpoint blocks stream from page
# cache/disk — the right trade on a real 8 GiB executor
export I2MR_CKPT_LEVEL=${I2MR_CKPT_LEVEL:-DISK_ONLY}
# zstd shuffle/spill: the array-carrying triangle shuffle writes >60 GB
# of lz4 spill at sf100 — more than one local disk (r12 disk-full)
export I2MR_IO_CODEC=${I2MR_IO_CODEC:-zstd}
export SWEEP_PARTITIONS=${SWEEP_PARTITIONS:-1024}
export SWEEP_MAX_PARTITION_BYTES=${SWEEP_MAX_PARTITION_BYTES:-33554432}
KEYS=${KEYS:-"iter_mst_forest iter_triangle_count iter_pagerank iter_scc iter_connected_components"}
FAIL=0
for K in $KEYS; do
    B="/tmp/sweep_sf100_base8_$K.json"
    SWEEP_SF_DIR="$SF10" SWEEP_OUT="$B" python tools/sweep_sf01.py "$K" \
        || { echo "BASELINE FAIL: $K"; FAIL=1; continue; }
    SWEEP_SF_DIR="$SF100" SWEEP_BASELINE="$B" \
        SWEEP_MAX_RATIO=${SWEEP_MAX_RATIO:-10} \
        SWEEP_OUT="/tmp/sweep_sf100_times8_$K.json" \
        python tools/sweep_sf01.py "$K" \
        || { echo "SF100 FAIL: $K"; FAIL=1; }
done
exit $FAIL
