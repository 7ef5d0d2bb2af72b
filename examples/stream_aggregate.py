"""stream_aggregate example — 1:1 translation of the reference's
py-denormalized/python/examples/stream_aggregate.py.

With a Kafka broker (the reference's setup):

    docker run --rm -p 9092:9092 emgeee/kafka_emit_measurements:latest
    python examples/stream_aggregate.py

Without one (this sandbox), ``--demo`` replays the events parquet
table as a file-backed stream through the exact same pipeline:

    python examples/stream_aggregate.py --demo
"""

import json
import pprint as pp
import signal
import sys

from denormalized_spark import Context
from denormalized_spark.datafusion import functions as f
from denormalized_spark.datafusion import col, lit

signal.signal(signal.SIGINT, lambda sig, frame: sys.exit(0))

bootstrap_server = "localhost:9092"
timestamp_column = "occurred_at_ms"

sample_event = {
    "occurred_at_ms": 100,
    "sensor_name": "foo",
    "reading": 0.0,
}


def print_batch(df):
    pp.pprint(df.toPandas().to_dict("list"))


ctx = Context()

if "--demo" in sys.argv:
    # file-backed stand-in: events(ts, event_type, amount) plays the
    # role of the sensor topic; same operators downstream.
    ds = (
        ctx.from_stream_parquet("/root/testdata/sf0.001", "events", event_time="ts")
        .with_column("sensor_name", col("event_type"))
        .with_column("reading", col("value"))
    )
    threshold = 0.0
else:
    ds = ctx.from_topic(
        "temperature", json.dumps(sample_event), bootstrap_server, timestamp_column
    )
    threshold = 113.0

query = (
    ds.window(
        [col("sensor_name")],
        [
            f.count(col("reading"), distinct=False, filter=None).alias("count"),
            f.min(col("reading")).alias("min"),
            f.max(col("reading")).alias("max"),
            f.avg(col("reading")).alias("average"),
            f.median(col("reading")).alias("median"),
            f.stddev(col("reading")).alias("stddev"),
        ],
        1000,
        None,
    )
    .filter(col("max") > lit(threshold))
    .sink(print_batch)
)

query.awaitTermination(60 if "--demo" in sys.argv else None)
