"""Dev loop: validate query keys against the DuckDB oracle locally.

Usage: python tools/check_oracle.py [key ...]        (default: all keys)
       I2MR_SF_DIR=/root/testdata/sf0.01 to change scale.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from i2mapreduce_spark.oracle import compare, oracle_connect
from i2mapreduce_spark.queries import build_registry
from i2mapreduce_spark.session import get_spark


def main() -> int:
    sf_dir = os.environ.get("I2MR_SF_DIR", "/root/testdata/sf0.01")
    queries, oracles = build_registry()
    keys = sys.argv[1:] or list(queries)
    spark = get_spark(shuffle_partitions=8)
    con = oracle_connect(sf_dir)
    n_fail = 0
    for key in keys:
        t0 = time.time()
        try:
            df = queries[key](spark, sf_dir)
            if key in oracles:
                res = compare(key, df, con, oracles[key])
                ok = res.ok
                msg = str(res)
            else:
                n = df.count()
                ok = n >= 0
                msg = f"[ROWS] {key}: {n} rows (no oracle — rows-only)"
        except Exception as e:  # noqa: BLE001
            ok, msg = False, f"[ERR ] {key}: {type(e).__name__}: {str(e)[:300]}"
        n_fail += (not ok)
        print(f"{msg}  ({time.time() - t0:.2f}s)", flush=True)
    print(f"\n{len(keys) - n_fail}/{len(keys)} passed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
