"""Synthesize the extreme-magnitude fixture for the numeric-robustness
sweep (r10 — the seventh degenerate axis).

At 100 TB, value columns span many more orders of magnitude than the
driver fixtures' 1e2-1e5 range: enterprise invoices, micro-transactions
and aggregated rollups coexist.  Magnitude is exactly where the
engines' numeric paths diverge — round(DOUBLE, 2) ties flap between
HALF_UP and HALF_EVEN once the value carries 14+ significant digits,
DECIMAL(18,2) casts overflow where unbounded DECIMAL does not, and
BIGINT cent-sums approach 2^63 earlier — so the repo's exact-integer /
single-quotient disciplines deserve proof at hostile magnitudes rather
than assumption.

Derivation (deterministic): every money/measure DOUBLE column is
scaled x1e6 (a clean decimal shift: the relative value ORDER and all
join/group semantics are unchanged, only magnitudes move from ~1e4 to
~1e10 per row and ~1e13-1e15 in aggregates).  Fractions (l_discount,
l_tax), keys, dates, enums and text are untouched.

- orders.o_totalprice      x 1e6
- lineitem.l_extendedprice x 1e6
- customer.c_acctbal       x 1e6
- supplier.s_acctbal       x 1e6
- part.p_retailprice       x 1e6
- events.value             x 1e6

Usage:  python tools/make_extreme.py [src_dir] [out_dir]
        (defaults /root/testdata/sf0.001 -> /tmp/testdata/sf001big)
"""

from __future__ import annotations

import os
import sys

import duckdb

SCALE = "1000000"

RULES: dict[str, list[str]] = {
    "orders": ["o_totalprice"],
    "lineitem": ["l_extendedprice"],
    "customer": ["c_acctbal"],
    "supplier": ["s_acctbal"],
    "part": ["p_retailprice"],
    "events": ["value"],
}

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/testdata/sf001big"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for t in TABLES:
        cols = [r[0] for r in con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{src}/{t}.parquet')"
        ).fetchall()]
        scaled = set(RULES.get(t, []))
        exprs = [
            f"{c} * {SCALE} AS {c}" if c in scaled else c for c in cols
        ]
        con.execute(
            f"COPY (SELECT {', '.join(exprs)} FROM "
            f"read_parquet('{src}/{t}.parquet')) TO '{out}/{t}.parquet' "
            "(FORMAT PARQUET)"
        )
        print(f"{t}: {len(scaled)} column(s) scaled x{SCALE}")
    con.close()


if __name__ == "__main__":
    main()
