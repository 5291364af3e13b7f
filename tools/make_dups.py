"""Synthesize the duplicate-saturated fixture for the dup-correctness sweep.

The sf10 canary (SWEEP_SF10.md) proved duplicate saturation is a SCALE
hazard — bucketed candidate joins go quadratic in the duplication
factor — and r9 fixed it with exact-duplicate collapse inside the
LSH/IVF/MinHash kernels.  This fixture makes duplication a
CORRECTNESS axis too: every document and embedding is repeated DUPS
times under fresh ids (id + i*stride), so all 469 keys — especially
the collapse paths' within-group pair synthesis and representative
expansion — get hash-compared against their DuckDB oracles on content
where near-dup groups are 50 deep and every "unique" statistic must
still count repeats correctly.  Other tables copy through unchanged
(key-structure duplication is the sf1/sf10 fixtures' job; this one
isolates CONTENT duplication at oracle-checkable scale).

The default duplication factor is 10, NOT higher: the declared-exact
quadratic keys (dedup_near_jaccard / containment / ensemble_vote) and
— decisively — their DuckDB ORACLES must run the same all-co-shingle
joins on this fixture, and those grow with the SQUARE of the dup
factor (a 50x first attempt wedged dedup_ensemble_vote for 25+ minutes
on both engines).  10x matches the sf1 regime while keeping every key
and every oracle sweep-able in seconds.

Usage:  python tools/make_dups.py [src_dir] [out_dir] [dups]
        (defaults /root/testdata/sf0.001 -> /tmp/testdata/sf001dup, 10)
"""

from __future__ import annotations

import os
import sys

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

DUP_TABLES = {"documents": "doc_id", "embeddings": "vec_id"}


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/testdata/sf001dup"
    dups = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for t in TABLES:
        if t in DUP_TABLES:
            pk = DUP_TABLES[t]
            stride = con.execute(
                f"SELECT max({pk}) + 1 FROM read_parquet('{src}/{t}.parquet')"
            ).fetchone()[0]
            # max() over an empty table is NULL; the REPLACE expression
            # would then silently write NULL ids — fail loudly instead
            if stride is None:
                raise SystemExit(
                    f"{t} is empty in {src}: cannot derive a duplication "
                    f"stride from max({pk})"
                )
            con.execute(
                f"COPY (SELECT * REPLACE ({pk} + i * {stride} AS {pk}) "
                f"FROM read_parquet('{src}/{t}.parquet'), "
                f"(SELECT unnest(range({dups})) AS i) "
                f"ORDER BY {pk}) TO '{out}/{t}.parquet' (FORMAT PARQUET)"
            )
            n = con.execute(
                f"SELECT count(*) FROM read_parquet('{out}/{t}.parquet')"
            ).fetchone()[0]
            print(f"{t}: x{dups} -> {n} rows (stride {stride})")
        else:
            con.execute(
                f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet')) "
                f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
            )
            print(f"{t}: copied")
    con.close()


if __name__ == "__main__":
    main()
