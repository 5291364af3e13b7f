"""Dev loop: validate query keys against the DuckDB oracle locally.

Usage: python tools/check_oracle.py [key ...]        (default: all keys)
       I2MR_SF_DIR=/root/testdata/sf0.01 to change scale.
       I2MR_ROWS_ONLY_KEYS=k1,k2 demotes the named keys to a rows-only
       check FOR THIS RUN — used by fixture legs where a key's output
       is provably precision-bound rather than wrong (e.g. the extreme-
       magnitude leg: a fixed-dp rounding of an irrational double whose
       magnitude pushes the output past ~15.9 significant digits cannot
       hash-match cross-engine; each allowance carries a rationale in
       the calling sweep script).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from i2mapreduce_spark.oracle import compare, compare_tolerant, oracle_connect
from i2mapreduce_spark.queries import build_registry
from i2mapreduce_spark.session import get_spark


def main() -> int:
    sf_dir = os.environ.get("I2MR_SF_DIR", "/root/testdata/sf0.01")
    demoted = {
        k for k in os.environ.get("I2MR_ROWS_ONLY_KEYS", "").split(",") if k
    }
    # I2MR_SKIP_KEYS: keys not run at all on this fixture — reserved for
    # keys that fail LOUDLY outside their declared numeric domain (ANSI
    # overflow by contract); each skip carries a rationale in the
    # calling sweep script
    skipped = {
        k for k in os.environ.get("I2MR_SKIP_KEYS", "").split(",") if k
    }
    # I2MR_TOL_KEYS="key=rtol:atol,...": value-level oracle check at an
    # explicit tolerance (r10 verdict item 6) — for fixture legs where
    # a key's float output is precision-bound (1-ulp FMA drift,
    # >15.9-sig-digit display rounding).  Strictly stronger than a
    # rows-only demotion: schema, row count, non-float cells and
    # float-within-tolerance are all still asserted.
    tol_keys: dict[str, tuple[float, float]] = {}
    for spec in os.environ.get("I2MR_TOL_KEYS", "").split(","):
        if not spec:
            continue
        name, _, tols = spec.partition("=")
        rtol_s, _, atol_s = tols.partition(":")
        tol_keys[name] = (float(rtol_s), float(atol_s or "0"))
    queries, oracles = build_registry()
    # a typo'd demotion leaves the key fully checked (safe) but a typo'd
    # SKIP silently skips nothing while the calling sweep believes its
    # documented exemption is active — and stale names linger after a
    # key rename.  Fail loud on names that match no registered key
    # (r10 advice).
    unknown = sorted((demoted | skipped | set(tol_keys)) - set(queries))
    if unknown:
        raise SystemExit(
            f"I2MR_ROWS_ONLY_KEYS/I2MR_SKIP_KEYS name unregistered keys: "
            f"{unknown} — fix the calling sweep's list"
        )
    keys = sys.argv[1:] or list(queries)
    if skipped:
        print(f"skipping {sorted(skipped & set(keys))} (I2MR_SKIP_KEYS)")
        keys = [k for k in keys if k not in skipped]
    spark = get_spark(shuffle_partitions=8)
    con = oracle_connect(sf_dir)
    n_fail = 0
    for key in keys:
        t0 = time.time()
        try:
            df = queries[key](spark, sf_dir)
            if key in oracles and key in tol_keys:
                rtol, atol = tol_keys[key]
                res = compare_tolerant(key, df, con, oracles[key], rtol, atol)
                ok = res.ok
                msg = str(res)
            elif key in oracles and key not in demoted:
                res = compare(key, df, con, oracles[key])
                ok = res.ok
                msg = str(res)
            elif key in demoted:
                n = df.count()
                ok = n >= 0
                msg = f"[ROWS] {key}: {n} rows (demoted for this run)"
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
