"""i2mapreduce_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
i2MapReduce reference (zhangyf-neu/i2mapreduce — an incremental/iterative
MapReduce framework derived from Hadoop 1.0.x; see SURVEY.md §0-2):

- classic MapReduce surface (map/combine/shuffle/reduce, custom
  partitioning, secondary sort)           -> :mod:`i2mapreduce_spark.mapred`
- iterative computation with cached static "structure" data and an
  evolving "state" (PageRank, SSSP, CC, k-means, APriori)
                                          -> :mod:`i2mapreduce_spark.plans.iterate`
- fine-grained incremental processing (MRBG-store analog = stateful
  incremental folds / Structured Streaming)
                                          -> :mod:`i2mapreduce_spark.streaming`
- plus LLM-data-pipeline operators (dedup, similarity search, text
  analysis, multimodal plumbing)          -> :mod:`i2mapreduce_spark.operators`

Everything is declared through the DataFrame/SQL API so Catalyst/Tungsten
pick the physical strategy; Python UDFs only where semantics require
(Arrow-batched pandas UDFs, never row-at-a-time in hot paths).
"""

__version__ = "0.1.0"

from .session import configure_session, get_spark  # noqa: F401
from .catalog import load_tables, TABLES  # noqa: F401
