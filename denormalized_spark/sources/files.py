"""File sources — parquet/csv/json batch + streaming readers.

The reference inherits batch file IO from its engine (vendored
SessionContext.read_parquet/register_csv/..., SURVEY §2.1). Spark has
the same surface natively; these helpers add the test-data
conventions (a directory of ``<table>.parquet``) and file-streaming,
which doubles as the deterministic stream source for tests (the
reference's equivalent is its Kafka + docker generator setup —
its docs/kafka_rideshare_example.md; our broker-free translation is
examples/kafka_rideshare.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TPCH_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _nanos_timestamp_columns(path: str) -> list[str]:
    """Columns stored as parquet TIMESTAMP(NANOS), which Spark reads
    as long under spark.sql.legacy.parquet.nanosAsLong=true."""
    try:
        import pyarrow.parquet as pq
        import pyarrow as pa
    except ImportError:
        return []
    try:
        schema = pq.read_schema(path)
    except (FileNotFoundError, OSError):
        if os.path.isdir(path):
            # multi-file dataset: take the schema of any one part
            parts = [p for p in os.listdir(path) if p.endswith(".parquet")]
            if not parts:
                return []
            schema = pq.read_schema(os.path.join(path, parts[0]))
        else:
            raise
    return [
        f.name
        for f in schema
        if pa.types.is_timestamp(f.type) and f.type.unit == "ns"
    ]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one parquet table; ns-timestamp columns come back as long
    (session sets nanosAsLong) and are converted to TimestampType via
    integer-div truncation to micros — matching DuckDB's read of the
    same file, so oracle comparisons see identical values."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    df = spark.read.parquet(path)
    return _convert_nanos_longs(df, path)


def _convert_nanos_longs(df: DataFrame, path: str) -> DataFrame:
    """Convert ns-timestamp columns that Spark actually read as long.
    The Spark-side dtype check matters: INT96 timestamps (Spark's own
    default parquet output) are reported as ns by pyarrow but read as
    proper timestamps by Spark — converting those would be a type
    error."""
    from pyspark.sql.types import LongType

    long_cols = {f.name for f in df.schema.fields if isinstance(f.dataType, LongType)}
    for c in _nanos_timestamp_columns(path):
        if c in long_cols:
            df = df.withColumn(c, F.expr(f"timestamp_micros({c} div 1000)"))
    return df


def register_tables(spark: SparkSession, sf_dir: str, tables=TPCH_TABLES) -> dict[str, DataFrame]:
    """Load every table and register it as a temp view, enabling the
    SQL surface over the same data the DataFrame API sees."""
    out = {}
    for name in tables:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            df = load_table(spark, sf_dir, name)
            df.createOrReplaceTempView(name)
            out[name] = df
    return out


def stream_table(
    spark: SparkSession, sf_dir: str, name: str, *, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Read a parquet table as an unbounded stream (schema taken from
    a batch peek — file streams need an explicit schema). This is the
    deterministic stream source used by the streaming tests."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    schema = spark.read.parquet(path).schema
    # FileStreamSource needs a directory; stage a symlink dir when the
    # table is a single file (the driver's testdata layout).
    stream_path = path
    if os.path.isfile(path):
        import hashlib
        import tempfile

        # staging dir must be DETERMINISTIC per source path: the
        # checkpoint log records the source directory, so a fresh
        # mkdtemp per call would break offset resume across restarts
        # (FileStreamSource raises a basePath mismatch)
        tag = hashlib.md5(os.path.abspath(path).encode()).hexdigest()[:12]
        d = os.path.join(tempfile.gettempdir(), f"stream_{name}_{tag}")
        os.makedirs(d, exist_ok=True)
        link = os.path.join(d, f"{name}.parquet")
        if not os.path.exists(link):
            try:
                os.symlink(path, link)
            except OSError:
                import shutil

                shutil.copy(path, link)
        stream_path = d
    reader = spark.readStream.schema(schema).format("parquet")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    df = reader.load(stream_path)
    return _convert_nanos_longs(df, path)
