"""Import-compat shim for the reference's ``denormalized.datafusion``
namespace (the vendored datafusion-python surface its examples use):

    # reference script                      # this engine
    from denormalized import Context        from denormalized_spark import Context
    from denormalized.datafusion import (   from denormalized_spark.datafusion import (
        col, lit, functions as f,               col, lit, functions as f,
        udf, udaf, Accumulator)                 udf, udaf, Accumulator)

so a py-denormalized script ports by rewriting only its import lines
(see examples/ for full translations). ``col``/``lit`` are Spark's
own; ``functions`` is the 232-name DataFusion-compatible expression
surface; ``udf``/``udaf``/``Accumulator``/``Volatility`` follow the
reference protocol (reference udf.py:78-248).
"""

from __future__ import annotations

from pyspark.sql.functions import col, lit

from denormalized_spark import functions
from denormalized_spark.udf import (
    Accumulator,
    AggregateUDF,
    ScalarUDF,
    Volatility,
    udaf,
    udf,
)

__all__ = [
    "col",
    "lit",
    "functions",
    "udf",
    "udaf",
    "Accumulator",
    "AggregateUDF",
    "ScalarUDF",
    "Volatility",
]
