#!/bin/sh
# Third-decade canary (r10 verdict item 2): sf100 = 10 key-shifted
# copies of the sf10 fixture, i.e. 1000x the grading scale and ~17 GB
# of parquet — documents/embeddings reach ~1000 identical copies per
# payload, the worst case the dedup/ANN collapse paths are designed
# for.  Runs the same heavy set as tools/sweep_sf10.sh (plus the r11
# grouped-dedup key, whose O(unique^2) output contract is exactly what
# 1000-copy duplication stresses) at the 8 GiB/input-scaled-partitions
# configuration §r10 proved out — the config that transfers to a real
# cluster, not a big-heap crutch:
#   - 8 GiB heap (I2MR_DRIVER_MEM=8g)
#   - 32 MB scan splits (partition count scales with input bytes)
#   - shuffle partitions scaled 4x over the sf10 sweep's 256 (1024 —
#     per-task post-shuffle bytes grow ~2.5x across the decade, AQE
#     coalesces where a stage's data is small; 2048 traded that
#     headroom for driver-metadata pressure, see the per-key note)
# Both passes run the SAME config so the min-of-3 interleaved
# re-probe's numerator and denominator compare like against like
# (tools/sweep_sf01.py records and checks the config since r11).
# iter_connected_components runs separately at local[8]x8g — 32 cores
# per 8 GiB executor is not a cluster shape that exists (§r10).
# Results table: SWEEP_SF10.md §sf100.
set -e
cd "$(dirname "$0")/.."
SF10=${SF10:-/tmp/testdata/sf10}
SF100=${SF100:-/tmp/testdata/sf100}
export I2MR_DRIVER_MEM=${I2MR_DRIVER_MEM:-8g}
export SWEEP_PARTITIONS=${SWEEP_PARTITIONS:-1024}
export SWEEP_MAX_PARTITION_BYTES=${SWEEP_MAX_PARTITION_BYTES:-33554432}
STAMP=$(md5sum tools/make_sf1.py | cut -d' ' -f1)
if [ ! -d "$SF10/lineitem.parquet" ] || \
   [ "$(cat "$SF10/.genstamp" 2>/dev/null)" != "$STAMP" ]; then
    echo "sf10 fixture stale/missing — regenerate via tools/sweep_sf10.sh first" >&2
    exit 2
fi
if [ ! -d "$SF100/lineitem.parquet" ] || \
   [ "$(cat "$SF100/.genstamp" 2>/dev/null)" != "$STAMP" ]; then
    python tools/make_sf1.py "$SF100" --copies 10 --src "$SF10"
    printf '%s' "$STAMP" > "$SF100/.genstamp"
fi
# Default KEYS exclude the heavy fixpoints (iter_scc, iter_triangle_count,
# iter_mst_forest, iter_pagerank, iter_connected_components): all of them
# exhaust per-task execution memory at local[32]x8g at sf100 and are
# covered by tools/sweep_sf100_cc.sh's local[8]x8g leg instead (r11
# ADVICE: keep the two scripts' key lists consistent with the stated
# displacement).
KEYS=${KEYS:-"sim_ann_lsh sim_ann_ivf
dedup_minhash_lsh dedup_simhash dedup_simhash_grouped iter_als_topitems"}
# One process PER KEY PER PASS (r11 lesson): a single warm session
# running the whole heavy set at sf100-scale partition counts dies of
# accumulated driver metadata — iter_scc's fixpoint alone retires
# ~5,000 stages, and at 2,048 shuffle partitions the retained
# MapStatus/AQE bookkeeping OOM'd the 8 GiB heap on the key AFTER it
# (observed on the first run's sf10 baseline pass).  A fresh JVM per
# key bounds that accumulation and stops one key's death from
# poisoning the rest; the min-of-3 interleaved re-probe inside
# sweep_sf01.py still runs both SFs in the SAME process when a key
# breaches, so adjudicated ratios stay like-for-like.
FAIL=0
for K in $KEYS; do
    B="/tmp/sweep_sf100_base_$K.json"
    SWEEP_SF_DIR="$SF10" SWEEP_OUT="$B" python tools/sweep_sf01.py "$K" \
        || { echo "BASELINE FAIL: $K"; FAIL=1; continue; }
    SWEEP_SF_DIR="$SF100" SWEEP_BASELINE="$B" \
        SWEEP_MAX_RATIO=${SWEEP_MAX_RATIO:-10} \
        SWEEP_OUT="/tmp/sweep_sf100_times_$K.json" \
        python tools/sweep_sf01.py "$K" \
        || { echo "SF100 FAIL: $K"; FAIL=1; }
done
exit $FAIL
