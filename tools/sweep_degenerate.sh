#!/bin/sh
# Degenerate-input gate (r8): every registry key must be WELL-DEFINED on
# empty tables, single-row tables, and NULL-injected payload columns —
# at 100 TB an empty date partition, a tenant with no events, or a NULL
# in a value/text column is routine, and an operator that crashes there
# (seed collect()[0] -> IndexError, 1/n -> ZeroDivisionError,
# np.stack([]) -> ValueError, ANSI DIVIDE_BY_ZERO, UDF None access) or
# silently diverges from the oracle (NULL sort order, concat-vs-||,
# CASE-ELSE-0 vs boolean-cast-NULL) fails exactly when a production
# pipeline meets real data.  Runs the FULL 469-key registry,
# hash-compared against DuckDB where an oracle exists, on all three
# fixtures.  Exit 1 on any error or mismatch.
set -e
cd "$(dirname "$0")/.."
OUT_ROOT=${OUT_ROOT:-/tmp/testdata}
# ALWAYS regenerate (r8 advice): gating on file existence silently
# reused a stale /tmp copy after a generator edit, making the gate
# report green against old data.  The generators run in ~1s each.
python tools/make_empty.py /root/testdata/sf0.001 "$OUT_ROOT"
python tools/make_nulls.py /root/testdata/sf0.001 "$OUT_ROOT/sf001nulls"
python tools/make_nulls.py /root/testdata/sf0.001 "$OUT_ROOT/sf001nullfk" --fks
python tools/make_unicode.py /root/testdata/sf0.001 "$OUT_ROOT/sf001uni"
python tools/make_dups.py /root/testdata/sf0.001 "$OUT_ROOT/sf001dup"
echo "== sf0 (all tables empty) =="
I2MR_SF_DIR="$OUT_ROOT/sf0" python tools/check_oracle.py
echo "== sfmin (one row per table) =="
I2MR_SF_DIR="$OUT_ROOT/sfmin" python tools/check_oracle.py
echo "== sf001nulls (10% NULLs in payload columns) =="
I2MR_SF_DIR="$OUT_ROOT/sf001nulls" python tools/check_oracle.py
echo "== sf001nullfk (5% NULLs in join-key columns) =="
I2MR_SF_DIR="$OUT_ROOT/sf001nullfk" python tools/check_oracle.py
echo "== sf001uni (10% multibyte-unicode document text) =="
I2MR_SF_DIR="$OUT_ROOT/sf001uni" python tools/check_oracle.py
echo "== sf001dup (every document/embedding x10 identical copies) =="
I2MR_SF_DIR="$OUT_ROOT/sf001dup" exec python tools/check_oracle.py
