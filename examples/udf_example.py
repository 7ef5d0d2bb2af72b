"""udf_example — 1:1 translation of the reference's
py-denormalized/python/examples/udf_example.py: an Arrow-native
scalar UDF (pyarrow Arrays in, pyarrow Array out) applied on top of a
windowed streaming aggregate.

``--demo`` runs without a broker by replaying the events parquet
table as a stream:

    python examples/udf_example.py --demo
"""

import json
import signal
import sys

import pyarrow as pa
import pyarrow.compute as pc

from denormalized_spark import Context
from denormalized_spark.datafusion import functions as f
from denormalized_spark.datafusion import udf
from denormalized_spark.datafusion import col, lit

signal.signal(signal.SIGINT, lambda sig, frame: sys.exit(0))

DEMO = "--demo" in sys.argv

bootstrap_server = "localhost:9092"
timestamp_column = "occurred_at_ms"

sample_event = {
    "occurred_at_ms": 100,
    "sensor_name": "foo",
    "reading": 0.0,
}


def gt(lhs: pa.Array, rhs: pa.Array) -> pa.Array:
    return pc.greater(lhs, rhs)


greater_than_udf = udf(gt, [pa.float64(), pa.float64()], pa.bool_(), "stable")


def print_batch(df):
    rows = df.collect()
    if not rows:
        return
    print(rows[:5])


ctx = Context()

if DEMO:
    ds = (
        ctx.from_stream_parquet("/root/testdata/sf0.001", "events", event_time="ts")
        .with_column("sensor_name", col("event_type"))
        .with_column("reading", col("value"))
    )
    window_ms, threshold = 3600_000, 3.0
else:
    ds = ctx.from_topic(
        "temperature", json.dumps(sample_event), bootstrap_server, timestamp_column
    )
    window_ms, threshold = 1000, 1400.0

query = (
    ds.window(
        [col("sensor_name")],
        [
            f.count(col("reading"), distinct=False, filter=None).alias("count"),
            f.min(col("reading")).alias("min"),
            f.max(col("reading")).alias("max"),
            f.avg(col("reading")).alias("average"),
        ],
        window_ms,
        None,
    )
    .with_column(
        "greater_than",
        greater_than_udf(col("count").cast("double"), lit(threshold)),
    )
    .sink(print_batch)
)

query.awaitTermination(120 if DEMO else None)
