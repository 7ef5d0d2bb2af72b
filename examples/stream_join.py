"""stream_join example — 1:1 translation of the reference's
py-denormalized/python/examples/stream_join.py (window-then-join of
two streams on the window start).

The Kafka form mirrors the reference exactly (two topics, per-sensor
4-second windows). ``--demo`` drives the same window→join plan from a
parquet-backed stream without a broker — purchases vs clicks from the
events table, globally windowed per side, joined on the window bound:

    python examples/stream_join.py --demo
"""

import json
import pprint as pp
import signal
import sys

from denormalized_spark import Context
from denormalized_spark.datafusion import functions as f
from denormalized_spark.datafusion import col

signal.signal(signal.SIGINT, lambda sig, frame: sys.exit(0))

DEMO = "--demo" in sys.argv

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

if DEMO:
    base = ctx.from_stream_parquet("/root/testdata/sf0.001", "events", event_time="ts")
    temperature_ds = base.filter(col("event_type") == "purchase").with_column(
        "reading", col("value")
    )
    humidity_src = base.filter(col("event_type") == "click").with_column(
        "reading", col("value")
    )
    # sparse demo data: global windows per side, wide enough to match
    group_t, group_h = [], []
    window_ms = 6 * 3600_000
    left_on = ["window_start_time"]
    right_on = ["humidity_window_start_time"]
else:
    temperature_ds = ctx.from_topic(
        "temperature", json.dumps(sample_event), bootstrap_server, timestamp_column
    )
    humidity_src = ctx.from_topic(
        "humidity", json.dumps(sample_event), bootstrap_server, timestamp_column
    ).with_column("humidity_sensor", col("sensor_name")).drop_columns("sensor_name")
    group_t = [col("sensor_name")]
    group_h = [col("humidity_sensor")]
    window_ms = 4000
    left_on = ["sensor_name", "window_start_time"]
    right_on = ["humidity_sensor", "humidity_window_start_time"]

humidity_ds = (
    humidity_src.window(
        group_h,
        [f.count(col("reading")).alias("avg_humidity")],
        window_ms,
        None,
    )
    .with_column("humidity_window_start_time", col("window_start_time"))
    .with_column("humidity_window_end_time", col("window_end_time"))
    .drop_columns("window_start_time", "window_end_time")
)

joined_ds = (
    temperature_ds.window(
        group_t,
        [f.avg(col("reading")).alias("avg_temperature")],
        window_ms,
        None,
    )
    .join(humidity_ds, "inner", left_on, right_on)
    .sink(print_batch)
)

joined_ds.awaitTermination(180 if DEMO else None)
