"""Query registry: merges every group's QUERIES/ORACLES dicts.

Each group module exposes
  QUERIES: dict[key, callable(spark, sf_dir) -> DataFrame]
  ORACLES: dict[key, str]     # DuckDB-runnable ANSI SQL; omit => rows-only
Keys map 1:1 to SURVEY.md §2B.
"""

from __future__ import annotations

from importlib import import_module

_GROUP_MODULES = [
    "scans",        # S  — scans / sources / sinks
    "projection",   # P  — projection / filter / predicates
    "joins",        # C  — 9 join shapes
    "aggregates",   # D  — aggregation
    "windows_q",    # W  — window functions
    "sorts",        # F  — sort / limit / top-k
    "setops",       # U  — set operations
    "scalar_fns",   # X  — scalar function surface
    "mapred_q",     # I  — MapReduce-core surface
    "iterative",    # J  — iterative algorithms
    "streaming_q",  # K  — incremental / streaming
    "llmops",       # L  — LLM-data-pipeline operators
    "udfs",         # V  — UDF / UDAF / UDTF surface
]


def build_registry() -> tuple[dict, dict]:
    queries: dict = {}
    oracles: dict = {}
    for mod_name in _GROUP_MODULES:
        mod = import_module(f"{__name__}.{mod_name}")
        for k, fn in getattr(mod, "QUERIES", {}).items():
            if k in queries:
                raise ValueError(f"duplicate query key: {k}")
            queries[k] = fn
        for k, sql in getattr(mod, "ORACLES", {}).items():
            if k not in getattr(mod, "QUERIES", {}):
                raise ValueError(f"oracle without query: {k}")
            oracles[k] = sql
    return queries, oracles
