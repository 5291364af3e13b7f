#!/bin/sh
# Second-decade canary (r8 verdict item 6): the three big r7/r8 scale
# fixes — stats-reset loop checkpoints, the triangle edge-iterator, and
# the recall-compensated ANN autoscale — are verified one decade up
# (sf0.1 -> sf1).  This gate derives a ~sf10 fixture (10 key-shifted
# copies of sf1, i.e. 100x the grading scale) and re-times ONLY the
# heaviest keys to confirm the growth ratios hold a SECOND decade: a
# fix that merely moved a quadratic term one decade out alarms here.
# Same discipline as sweep_skew.sh: scripted baseline + ratio alarm,
# exit 1 on breach or error.  Results table: SWEEP_SF10.md.
set -e
cd "$(dirname "$0")/.."
SF1=${SF1:-/tmp/testdata/sf1}
SF10=${SF10:-/tmp/testdata/sf10}
# Default heap is 48g for historical comparability with the r9 tables.
# The REAL 100 TB answer is input-scaled partitioning, not heap (r9
# verdict item 3) — verified r10 with the default 8g heap:
#   I2MR_DRIVER_MEM=8g SWEEP_PARTITIONS=256 \
#   SWEEP_MAX_PARTITION_BYTES=33554432 \
#   BASE=/tmp/sweep_sf10_base_8g.json sh tools/sweep_sf10.sh
# (results: SWEEP_SF10.md §r10 — smaller scan partitions + AQE
# coalescing replace the big heap).  Applied to BOTH passes so the
# ratio compares like against like.
export I2MR_DRIVER_MEM=${I2MR_DRIVER_MEM:-48g}
# regen when absent OR the generator changed since the fixture was cut
STAMP=$(md5sum tools/make_sf1.py | cut -d' ' -f1)
if [ ! -d "$SF1/lineitem.parquet" ] || \
   [ "$(cat "$SF1/.genstamp" 2>/dev/null)" != "$STAMP" ]; then
    python tools/make_sf1.py "$SF1"
    printf '%s' "$STAMP" > "$SF1/.genstamp"
fi
if [ ! -d "$SF10/lineitem.parquet" ] || \
   [ "$(cat "$SF10/.genstamp" 2>/dev/null)" != "$STAMP" ]; then
    python tools/make_sf1.py "$SF10" --copies 10 --src "$SF1"
    printf '%s' "$STAMP" > "$SF10/.genstamp"
fi
# the heaviest keys by sf1 wall time (SWEEP_SF1.md r8 table) + the
# keys carrying the three scale fixes under test
KEYS="iter_scc iter_triangle_count sim_ann_lsh sim_ann_ivf
dedup_minhash_lsh dedup_simhash iter_als_topitems iter_mst_forest
iter_pagerank iter_connected_components"
BASE=${BASE:-/tmp/sweep_sf10_base.json}
SWEEP_SF_DIR="$SF1" SWEEP_OUT="$BASE" python tools/sweep_sf01.py $KEYS
SWEEP_SF_DIR="$SF10" SWEEP_BASELINE="$BASE" SWEEP_MAX_RATIO=${SWEEP_MAX_RATIO:-10} \
    SWEEP_OUT=/tmp/sweep_sf10_times.json \
    exec python tools/sweep_sf01.py $KEYS
