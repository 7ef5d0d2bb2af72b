"""Query registry: every implemented operator from SURVEY.md §2 gets
a (spark_impl, oracle_sql) pair. The driver runs both at sf=0.01 and
hash-compares results (order-insensitive, columns sorted by name), so

- every computed column is aliased IDENTICALLY in both,
- floats are rounded the same number of digits in both,
- all hashing is md5-based (identical across engines),
- top-k queries carry explicit tiebreaks so LIMIT is deterministic.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from denormalized_spark.queries import (
    curation,
    llm_pipeline,
    relational,
    streaming_windows,
    temporal,
    udf_queries,
)

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}

for mod in (relational, streaming_windows, llm_pipeline, udf_queries, temporal, curation):
    QUERIES.update(mod.QUERIES)
    ORACLES.update(mod.ORACLES)
