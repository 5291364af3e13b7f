#!/bin/sh
# Cross-engine hash-parity canary ONE DECADE UP (r8, SWEEP_SF1.md §r8):
# regenerate the sf1 stress fixture if absent, then hash-compare the 20
# cheapest hash-oracled backlog keys against DuckDB ON that fixture.
# BIGINT-overflow-class bugs appear one decade above the grading scale;
# re-run whenever an operator's arithmetic changes.  Exit 1 on any
# mismatch.
set -e
cd "$(dirname "$0")/.."
SF1=${SF1:-/tmp/testdata/sf1}
# regen when absent OR the generator changed since the fixture was cut
# (r8 advice: existence-gating silently reuses stale data after edits)
STAMP=$(md5sum tools/make_sf1.py | cut -d' ' -f1)
if [ ! -d "$SF1/lineitem.parquet" ] || \
   [ "$(cat "$SF1/.genstamp" 2>/dev/null)" != "$STAMP" ]; then
    python tools/make_sf1.py "$SF1"
    printf '%s' "$STAMP" > "$SF1/.genstamp"
fi
KEYS=$(python -c "import json; print(' '.join(list(json.load(open('tools/r8_window_costs.json')))[:20]))")
I2MR_SF_DIR="$SF1" exec python tools/check_oracle.py $KEYS
