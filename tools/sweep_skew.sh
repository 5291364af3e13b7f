#!/bin/sh
# Zipf hot-key skew gate (r8, SWEEP_SKEW.md): derive the skewed fixture
# from sf1 if absent, time the skew-sensitive keys on BOTH fixtures in
# the same configuration, and alarm if any key runs > 3x slower on the
# skewed data — same data volume, so a breach is a skew-handling
# failure, not growth.  Pass SWEEP_PARTITIONS=64 for the straggler
# regime (hot key >> mean partition).  Exit 1 on breach or error.
set -e
cd "$(dirname "$0")/.."
SF1=${SF1:-/tmp/testdata/sf1}
SKEW=${SKEW:-/tmp/testdata/sf1skew}
# regen when absent OR a generator changed since the fixture was cut
# (r8 advice: existence-gating silently reuses stale data after edits)
STAMP=$(md5sum tools/make_sf1.py | cut -d' ' -f1)
if [ ! -d "$SF1/lineitem.parquet" ] || \
   [ "$(cat "$SF1/.genstamp" 2>/dev/null)" != "$STAMP" ]; then
    python tools/make_sf1.py "$SF1"
    printf '%s' "$STAMP" > "$SF1/.genstamp"
fi
KSTAMP=$(md5sum tools/make_sf1.py tools/make_skew.py | md5sum | cut -d' ' -f1)
if [ ! -d "$SKEW/lineitem.parquet" ] || \
   [ "$(cat "$SKEW/.genstamp" 2>/dev/null)" != "$KSTAMP" ]; then
    python tools/make_skew.py "$SF1" "$SKEW"
    printf '%s' "$KSTAMP" > "$SKEW/.genstamp"
fi
KEYS="mr_salted_skew_agg join_skew_salted mr_secondary_sort
window_topk_per_group window_funnel_stages stream_session_window
join_multiway agg_pricing_summary agg_count_min_sketch agg_skew_kurt
mr_wordcount"
BASE=/tmp/sweep_skew_uniform_base.json
SWEEP_SF_DIR="$SF1" SWEEP_OUT="$BASE" python tools/sweep_sf01.py $KEYS
SWEEP_SF_DIR="$SKEW" SWEEP_BASELINE="$BASE" SWEEP_MAX_RATIO=3 \
    SWEEP_OUT=/tmp/sweep_skew_times.json \
    exec python tools/sweep_sf01.py $KEYS
