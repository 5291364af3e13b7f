"""Synthesize the NULL-injected fixture for the null-semantics sweep.

The driver fixtures contain no NULL anywhere, so the registry's
NULL-handling is structurally untested — yet at 100 TB real columns
have NULLs, and the engines disagree by DEFAULT on exactly the places
a query can't see locally: Spark orders ASC NULLS FIRST / DESC NULLS
LAST, DuckDB defaults to NULLS LAST on ASC (ranked keys silently
reorder); aggregates skip NULLs identically, but count(col)/count(*),
grouping on a NULL key, and NULL propagation through exact-integer
pipelines all deserve proof rather than assumption.

Derivation (deterministic, PK-keyed, ~10% per column — value/text
payload columns only; join keys, dates, and enum grouping flags stay
NOT NULL so query semantics remain recognizable):

- orders.o_totalprice     NULL where o_orderkey % 10 = 3
- lineitem.l_discount     NULL where (l_orderkey + l_linenumber) % 10 = 3
- events.value            NULL where event_id % 10 = 3
- events.props            NULL where event_id % 10 = 7
- documents.text          NULL where doc_id % 10 = 3
- documents.lang          NULL where doc_id % 10 = 7  (a NULL group key)
- customer.c_acctbal      NULL where c_custkey % 10 = 3

A second mode (``--fks``, r9 — the r8 verdict's next sweep axis) NULLs
~5% of the FOREIGN-KEY columns instead, the real-warehouse case the
payload fixture deliberately avoided: every equi/outer/asof/interval
join, NOT-IN subquery, and groupBy on these keys has engine-divergent
NULL semantics (NULL never equi-matches, null-safe `<=>` DOES, NOT IN
goes empty on a single NULL, group keys collect a NULL group, rank
orders flip NULLS FIRST/LAST):

- orders.o_custkey        NULL where o_orderkey % 20 = 7
- lineitem.l_partkey      NULL where (l_orderkey + l_linenumber) % 20 IN (7, 3)
- lineitem.l_suppkey      NULL where (l_orderkey + l_linenumber) % 20 IN (13, 3)
- events.user_id          NULL where event_id % 20 = 7

r10 extension (r9 verdict item 6) — the keys the first fixture skipped:

- lineitem.l_orderkey     NULL where (l_orderkey + l_linenumber) % 20 = 17
                          (orders |><| lineitem is the hottest join in
                          the registry; also breaks the (l_orderkey,
                          l_linenumber) composite total order)
- customer.c_nationkey    NULL where c_custkey % 10 = 7   (dim join;
                          10% because customer is small at sf0.001)
- supplier.s_nationkey    NULL where s_suppkey % 5 = 2    (20% — only
                          10 suppliers at sf0.001, %20 would hit none)
- the (l_partkey, l_suppkey) partsupp-style COMPOSITE key now has rows
  where BOTH halves are NULL (the shared %20 = 3 slice above), not
  just each half separately — derived part+supp views must neither
  match nor group such rows as if `(NULL, NULL) = (NULL, NULL)`.

Usage:  python tools/make_nulls.py [src_dir] [out_dir] [--fks]
        (defaults /root/testdata/sf0.001 -> /tmp/testdata/sf001nulls;
         with --fks the default out_dir is /tmp/testdata/sf001nullfk)
"""

from __future__ import annotations

import os
import sys

import duckdb

RULES: dict[str, list[tuple[str, str]]] = {
    "orders": [("o_totalprice", "o_orderkey % 10 = 3")],
    "lineitem": [("l_discount", "(l_orderkey + l_linenumber) % 10 = 3")],
    "events": [("value", "event_id % 10 = 3"),
               ("props", "event_id % 10 = 7")],
    "documents": [("text", "doc_id % 10 = 3"),
                  ("lang", "doc_id % 10 = 7")],
    "customer": [("c_acctbal", "c_custkey % 10 = 3")],
}

#: --fks mode: NULL ~5% of join-key columns (PK-keyed, deterministic)
FK_RULES: dict[str, list[tuple[str, str]]] = {
    "orders": [("o_custkey", "o_orderkey % 20 = 7")],
    "lineitem": [("l_partkey", "(l_orderkey + l_linenumber) % 20 IN (7, 3)"),
                 ("l_suppkey", "(l_orderkey + l_linenumber) % 20 IN (13, 3)"),
                 ("l_orderkey", "(l_orderkey + l_linenumber) % 20 = 17")],
    "events": [("user_id", "event_id % 20 = 7")],
    "customer": [("c_nationkey", "c_custkey % 10 = 7")],
    "supplier": [("s_nationkey", "s_suppkey % 5 = 2")],
}

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--fks"]
    fks = "--fks" in sys.argv[1:]
    src = args[0] if len(args) > 0 else "/root/testdata/sf0.001"
    out = args[1] if len(args) > 1 else (
        "/tmp/testdata/sf001nullfk" if fks else "/tmp/testdata/sf001nulls"
    )
    rules = FK_RULES if fks else RULES
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for t in TABLES:
        cols = [r[0] for r in con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{src}/{t}.parquet')"
        ).fetchall()]
        exprs = []
        nulled = dict(rules.get(t, []))
        for c in cols:
            if c in nulled:
                exprs.append(f"CASE WHEN {nulled[c]} THEN NULL ELSE {c} END AS {c}")
            else:
                exprs.append(c)
        con.execute(
            f"COPY (SELECT {', '.join(exprs)} FROM "
            f"read_parquet('{src}/{t}.parquet')) TO '{out}/{t}.parquet' "
            "(FORMAT PARQUET)"
        )
        print(f"{t}: {len(nulled)} column(s) null-injected")
    con.close()


if __name__ == "__main__":
    main()
