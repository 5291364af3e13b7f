"""Table catalog: load the fixture parquet tables as temp views.

The reference engine has no catalog — schema lives in each hand-written
MapReduce job (SURVEY §1.1).  Here tables are Parquet DataFrames registered
as temp views; Catalyst gets full schema, statistics and pushdown.

Scale notes:
- Views are lazy scans — no materialization at load time. Predicate
  pushdown / column pruning reach the parquet reader (asserted in tests).
- At 100 TB the same function points at a partitioned table root; nothing
  here assumes single files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .session import configure_session

#: Base fixture tables (FIXTURES.md §1) — also the DuckDB oracle's views.
TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

# Derived views (FIXTURES.md §3) used by iterative / LLM operators.
# Dialect-portable SQL: runs unchanged in Spark and DuckDB, so oracle
# queries can inline them as CTEs via cte().
DERIVED_SQL = {
    # bipartite customer->part graph; +1000000 keeps node id spaces disjoint
    "edges_cp": (
        "SELECT DISTINCT o_custkey AS src, l_partkey + 1000000 AS dst "
        "FROM orders JOIN lineitem ON l_orderkey = o_orderkey"
    ),
    # symmetric part co-purchase graph
    "edges_pp": (
        "SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst "
        "FROM lineitem a JOIN lineitem b "
        "ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey"
    ),
    # weighted variant: co-purchase count per pair.  One shared view for
    # every graph key that thresholds/weights by co-purchase count
    # (MST, k-core) — registered CACHE LAZY so a multi-query session
    # (the driver harness, drive_entry) materializes the lineitem
    # self-join once instead of once per graph query; single queries pay
    # nothing until first use.
    "edges_pp_w": (
        "SELECT a.l_partkey AS src, b.l_partkey AS dst, count(*) AS c "
        "FROM lineitem a JOIN lineitem b "
        "ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey "
        "GROUP BY 1, 2"
    ),
    # order -> set-of-parts baskets for APriori
    "baskets": (
        "SELECT l_orderkey AS basket, l_partkey AS item "
        "FROM lineitem GROUP BY l_orderkey, l_partkey"
    ),
}

_loaded: dict[tuple[int, str], bool] = {}


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table, applying the events ns-timestamp repair.

    events.ts is parquet INT64 TIMESTAMP(NANOS): with nanosAsLong=true it
    arrives as a raw long (ns since epoch) and is converted to
    TIMESTAMP_NTZ at microsecond precision — lossless for this data
    (verified: all values are us-aligned) and exactly what DuckDB's
    TIMESTAMP does with the same parquet (SURVEY Appendix A.1).
    """
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # integer DIV, not float division: at ~1.7e15 us the double quotient
        # is off by +-1 us (observed) and cast-truncation corrupts timestamps
        df = df.withColumn(
            "ts",
            F.timestamp_micros(F.expr("ts DIV 1000")).cast("timestamp_ntz"),
        )
    return df


def load_tables(spark: SparkSession, sf_dir: str, force: bool = False) -> None:
    """Register all base tables + derived views as temp views (idempotent).

    Cached per (session, sf_dir): repeated calls from the per-query
    entry points are free.
    """
    configure_session(spark)
    key = (id(spark), sf_dir)
    if _loaded.get(key) and not force:
        return
    for name in TABLES:
        read_table(spark, sf_dir, name).createOrReplaceTempView(name)
    # drop any prior sf_dir's cached co-purchase graph BEFORE the view
    # is replaced (uncache resolves the view to find the cache entry)
    try:
        spark.catalog.uncacheTable("edges_pp_w")
    except Exception:
        pass
    for view, sql in DERIVED_SQL.items():
        spark.sql(sql).createOrReplaceTempView(view)
    # lazy cache: first graph query pays the lineitem self-join, every
    # later graph query in the session reuses it
    spark.sql("CACHE LAZY TABLE edges_pp_w")
    # Spark-side edges_pp reads THROUGH the cached weighted view (the
    # group-by keys are exactly the distinct pairs), so CC/LPA/SSSP/
    # triangle/markov reuse the same materialization; the DERIVED_SQL
    # string above stays self-contained for the DuckDB cte() helper.
    spark.table("edges_pp_w").select("src", "dst").createOrReplaceTempView(
        "edges_pp"
    )
    # invalidate caches for other sf_dirs on the same session
    for k in [k for k in _loaded if k[0] == id(spark)]:
        _loaded.pop(k, None)
    _loaded[key] = True


def cte(*views: str) -> str:
    """WITH-clause prefix inlining derived views for oracle SQL strings."""
    parts = [f"{v} AS ({DERIVED_SQL[v]})" for v in views]
    return "WITH " + ", ".join(parts) + " "
