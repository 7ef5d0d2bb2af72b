"""Shared helpers for the query registry."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from denormalized_spark.sources.files import load_table


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one test table (handles the ns-timestamp conversion)."""
    return load_table(spark, sf_dir, name)
