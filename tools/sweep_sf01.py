"""Full-surface scale sweep: execute EVERY registry key once at sf0.1
(10x the correctness SF) in one warm session and report per-key seconds.

This is the regression harness SURVEY §6 describes: correctness runs at
sf0.01, so a key that silently grew a quadratic term still passes the
oracle gate — but its sf0.1/sf0.01 time ratio jumps past ~10x here.
Usage:

    python tools/sweep_sf01.py              # all keys at sf0.1
    SWEEP_SF_DIR=/root/testdata/sf0.01 python tools/sweep_sf01.py

Prints one line per key (seconds + row count, ERR on failure) and a
sorted slowest-20 summary; exit code 1 if any key errors.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from i2mapreduce_spark.queries import build_registry  # noqa: E402
from i2mapreduce_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = os.environ.get("SWEEP_SF_DIR", "/root/testdata/sf0.1")
    queries, _ = build_registry()
    spark = get_spark(app_name="i2mr-sweep", shuffle_partitions=8)
    t_all = time.perf_counter()
    times: dict[str, float] = {}
    errs: dict[str, str] = {}
    for i, (key, fn) in enumerate(queries.items(), 1):
        t0 = time.perf_counter()
        try:
            n = fn(spark, sf_dir).count()
            dt = time.perf_counter() - t0
            times[key] = dt
            print(f"[{i:3d}/{len(queries)}] {key}: {dt:.2f}s {n} rows", flush=True)
        except Exception as e:  # noqa: BLE001 — sweep must survey everything
            errs[key] = f"{type(e).__name__}: {e}"
            print(f"[{i:3d}/{len(queries)}] {key}: ERR {errs[key][:200]}", flush=True)
    total = time.perf_counter() - t_all
    print(f"\n=== {len(times)}/{len(queries)} succeeded in {total:.1f}s ===")
    for key, dt in sorted(times.items(), key=lambda kv: -kv[1])[:20]:
        print(f"  slow: {key} {dt:.2f}s")
    if errs:
        print(f"ERRORS ({len(errs)}):")
        for key, msg in errs.items():
            print(f"  {key}: {msg}")
    return 1 if errs else 0


if __name__ == "__main__":
    raise SystemExit(main())
