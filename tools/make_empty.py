"""Synthesize the DEGENERATE fixtures for the robustness sweep: every
table with ZERO rows (sf0), and every table with exactly ONE row (sfmin).

At 100 TB, empty input is not an edge case — it is Tuesday: an empty
date partition, a tenant with no events yet, a dedup pass over an
already-clean shard, an incremental delta with no changes.  An engine
whose operators crash on empty input (seed `collect()[0][0]` ->
IndexError, `1.0 / n_nodes` -> ZeroDivisionError, numpy kernels on
0-row batches) fails exactly when a production pipeline runs its first
or quietest partition.  The contract asserted by tools/sweep_empty.py:
every registry key returns a well-defined DataFrame (empty, or the
aggregate-on-empty row) instead of raising.

Schemas are copied bit-exactly from the driver fixture via pyarrow —
including the INT64 TIMESTAMP(NANOS) events.ts that probes session
config repair — so the degenerate fixtures exercise the same reader
paths as the real ones.  No Spark session needed; runs in ~1s.

Usage:  python tools/make_empty.py [src_dir] [out_root]
        (defaults /root/testdata/sf0.001 -> /tmp/testdata; writes
         /tmp/testdata/sf0/*.parquet and /tmp/testdata/sfmin/*.parquet)
"""

from __future__ import annotations

import os
import sys

import pyarrow.parquet as pq

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_root = sys.argv[2] if len(sys.argv) > 2 else "/tmp/testdata"
    for name, n_rows in (("sf0", 0), ("sfmin", 1)):
        out_dir = os.path.join(out_root, name)
        os.makedirs(out_dir, exist_ok=True)
        for t in TABLES:
            tbl = pq.read_table(os.path.join(src, f"{t}.parquet"))
            pq.write_table(tbl.slice(0, n_rows),
                           os.path.join(out_dir, f"{t}.parquet"))
        print(f"{out_dir}: {len(TABLES)} tables x {n_rows} row(s)")


if __name__ == "__main__":
    main()
