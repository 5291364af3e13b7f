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
