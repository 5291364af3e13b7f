"""Local replica of the driver's DuckDB-oracle correctness check.

For every hash-checked query key the driver runs the Spark callable and the
oracle SQL side-by-side and compares row count + schema + order-insensitive
value hash (SURVEY §5.1).  This module reproduces that check locally so each
key is validated the day it lands, never in batch at the end.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import duckdb
import pandas as pd

from .catalog import TABLES


def oracle_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """DuckDB connection with the same 10 views the driver pre-registers.

    Handles both layouts: the driver fixtures are single parquet FILES
    (`<t>.parquet`); Spark-written fixtures (the sf1/skew stress data)
    are DIRECTORIES of part files, which DuckDB needs globbed."""
    import os

    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{path}')"
        )
    return con


def _norm_value(v):
    """Canonicalize one cell so Spark/DuckDB values compare equal."""
    if v is None:
        return "<NULL>"
    if isinstance(v, float):
        if math.isnan(v):
            return "<NaN>"
        # queries already round floats per the determinism contract; the
        # driver's value-hash is STRICT about the sign of zero (-0.0 != 0.0,
        # proven by the fn_trig r2 fail), so keep the sign here too and fix
        # divergences at the query/oracle source with `+ 0.0`.
        return repr(round(v, 9))
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, int):
        return str(v)
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return str(v)


def canonical_rows(pdf: pd.DataFrame) -> list[tuple]:
    """Sort columns by name, normalize values, sort rows -> comparable list."""
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    rows = []
    for t in pdf.itertuples(index=False, name=None):
        rows.append(tuple(_norm_value(v) for v in t))
    rows.sort()
    return rows


@dataclass
class CompareResult:
    key: str
    ok: bool
    spark_rows: int
    oracle_rows: int
    notes: list[str] = field(default_factory=list)

    def __str__(self):
        s = "OK " if self.ok else "FAIL"
        msg = f"[{s}] {self.key}: spark={self.spark_rows} oracle={self.oracle_rows}"
        if self.notes:
            msg += " | " + "; ".join(self.notes)
        return msg


def compare_tolerant(key: str, spark_df, con: duckdb.DuckDBPyConnection,
                     sql: str, rtol: float, atol: float = 0.0,
                     max_diff_shown: int = 3) -> CompareResult:
    """Value-level oracle comparison at an EXPLICIT numeric tolerance.

    For keys whose outputs are precision-bound rather than wrong on a
    given fixture (the extreme-magnitude leg's 1-ulp FMA drift and
    >15.9-sig-digit display roundings — SWEEP_DEGENERATE.md §extreme
    class 3), a hash check must fail but a rows-only check verifies
    nothing about values.  This is the middle gate (r10 verdict item
    6): schema and row count must match exactly, non-float cells must
    match exactly, float cells must satisfy
    isclose(rel_tol=rtol, abs_tol=atol) — so a genuine logic
    regression (wrong row, wrong group, sign flip, off-by-one window)
    still fails while documented sub-precision drift passes.

    Row alignment: both frames sort by the canonicalized non-float
    columns, then by the float columns' values as tie-breakers — each
    side sorts its OWN float values, so rows whose floats differ only
    within tolerance still align positionally.  The max observed
    relative difference is reported in the notes so the declared rtol
    stays auditable against reality.
    """
    spdf = spark_df.toPandas()
    odf = con.execute(sql).df()
    if sorted(spdf.columns) != sorted(odf.columns):
        return CompareResult(key, False, len(spdf), len(odf), [
            f"schema: spark={sorted(spdf.columns)} oracle={sorted(odf.columns)}"
        ])
    if len(spdf) != len(odf):
        return CompareResult(key, False, len(spdf), len(odf),
                             ["row count mismatch"])
    cols = sorted(spdf.columns)
    spdf, odf = spdf[cols], odf[cols]
    float_cols = [
        c for c in cols
        if pd.api.types.is_float_dtype(spdf[c])
        or pd.api.types.is_float_dtype(odf[c])
    ]
    key_cols = [c for c in cols if c not in float_cols]

    def _row_order(df):
        keys = []
        for i, t in enumerate(df.itertuples(index=False, name=None)):
            kpart = tuple(
                _norm_value(t[cols.index(c)]) for c in key_cols
            )
            fpart = tuple(
                float("-inf")
                if t[cols.index(c)] is None
                or (isinstance(t[cols.index(c)], float)
                    and math.isnan(t[cols.index(c)]))
                else float(t[cols.index(c)])
                for c in float_cols
            )
            keys.append((kpart, fpart, i))
        return [i for _, _, i in sorted(keys, key=lambda x: (x[0], x[1]))]

    spdf = spdf.iloc[_row_order(spdf)].reset_index(drop=True)
    odf = odf.iloc[_row_order(odf)].reset_index(drop=True)
    notes: list[str] = []
    diffs: list[str] = []
    max_rel = 0.0
    for i in range(len(spdf)):
        for c in cols:
            a, b = spdf.at[i, c], odf.at[i, c]
            if c in key_cols:
                if _norm_value(a) != _norm_value(b):
                    diffs.append(f"row {i} {c}: {a!r} != {b!r}")
            else:
                a_nan = a is None or (isinstance(a, float) and math.isnan(a))
                b_nan = b is None or (isinstance(b, float) and math.isnan(b))
                if a_nan or b_nan:
                    if a_nan != b_nan:
                        diffs.append(f"row {i} {c}: {a!r} != {b!r}")
                    continue
                a, b = float(a), float(b)
                if not math.isclose(a, b, rel_tol=rtol, abs_tol=atol):
                    diffs.append(f"row {i} {c}: {a!r} !~ {b!r}")
                elif b != 0 or a != 0:
                    max_rel = max(
                        max_rel, abs(a - b) / max(abs(a), abs(b))
                    )
        if len(diffs) > max_diff_shown:
            break
    ok = not diffs
    if diffs:
        notes.append(f"tolerance({rtol:g},{atol:g}): "
                     + "; ".join(diffs[:max_diff_shown]))
    else:
        notes.append(f"tol-ok rtol={rtol:g} atol={atol:g} "
                     f"max_rel_seen={max_rel:.2e}")
    return CompareResult(key, ok, len(spdf), len(odf), notes)


def compare(key: str, spark_df, con: duckdb.DuckDBPyConnection, sql: str,
            max_diff_shown: int = 3) -> CompareResult:
    """Run the DuckDB oracle and diff against the Spark result."""
    spdf = spark_df.toPandas()
    odf = con.execute(sql).df()
    notes: list[str] = []
    ok = True
    if sorted(spdf.columns) != sorted(odf.columns):
        ok = False
        notes.append(f"schema: spark={sorted(spdf.columns)} oracle={sorted(odf.columns)}")
    if len(spdf) != len(odf):
        ok = False
        notes.append("row count mismatch")
    if ok:
        srows, orows = canonical_rows(spdf), canonical_rows(odf)
        if srows != orows:
            ok = False
            sset, oset = set(srows), set(orows)
            only_s = list(sset - oset)[:max_diff_shown]
            only_o = list(oset - sset)[:max_diff_shown]
            notes.append(f"values: only_spark={only_s} only_oracle={only_o}")
    return CompareResult(key, ok, len(spdf), len(odf))  if ok else \
           CompareResult(key, ok, len(spdf), len(odf), notes)
