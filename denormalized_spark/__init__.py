"""denormalized_spark — a PySpark-native streaming/batch analytics engine.

A from-scratch re-expression of the capabilities of
probably-nothing-labs/denormalized (a DataFusion-based single-node
stream processor) on top of Apache Spark:

- ``Context``     — session wrapper + source registration
                    (reference: crates/core/src/context.rs).
- ``DataStream``  — fluent stream/batch DataFrame façade
                    (reference: crates/core/src/datastream.rs).
- ``functions``   — the reference's scalar/aggregate expression surface
                    mapped onto pyspark.sql.functions
                    (reference: py-denormalized/python/denormalized/datafusion/functions.py).
- ``operators``   — windowed aggregation, joins, dedup, similarity,
                    text analysis, multimodal plumbing.

Everything here is idiomatic Spark: the logical plan is declared with
the DataFrame API and Catalyst/Tungsten pick the physical strategy.
"""

from denormalized_spark.context import Context
from denormalized_spark.datastream import DataStream
from denormalized_spark.session import get_spark
from denormalized_spark.udf import Accumulator, Volatility, udaf, udf

__all__ = [
    "Accumulator",
    "Context",
    "DataStream",
    "Volatility",
    "get_spark",
    "udaf",
    "udf",
]
__version__ = "0.1.0"
