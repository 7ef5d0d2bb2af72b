"""kafka_rideshare example — translation of the reference's
examples/examples/kafka_rideshare.rs: deeply nested IMU events,
schema inferred from one sample JSON, per-driver 5s/1s sliding window
over struct-field accessors, sunk back to Kafka.

``--demo`` needs no broker: it generates nested NDJSON events, streams
them from disk through the identical window plan, and prints batches:

    python examples/kafka_rideshare.py --demo
"""

import json
import signal
import sys

from denormalized_spark import Context
from denormalized_spark.datafusion import functions as f
from denormalized_spark.sources.kafka import infer_schema_from_json
from denormalized_spark.datafusion import col

signal.signal(signal.SIGINT, lambda sig, frame: sys.exit(0))

DEMO = "--demo" in sys.argv

bootstrap_servers = "localhost:9092"

sample_event = json.dumps(
    {
        "driver_id": "690c119e-63c9-479b-b822-872ee7d89165",
        "occurred_at_ms": 1715201766763,
        "imu_measurement": {
            "timestamp": "2024-05-08T20:56:06.763260Z",
            "accelerometer": {"x": 1.4187794, "y": -0.13967037, "z": 0.5483732},
            "gyroscope": {"x": 0.005840948, "y": 0.0035944171, "z": 0.0041645765},
            "gps": {
                "latitude": 72.3492587464122,
                "longitude": 144.85596244550095,
                "altitude": 2.9088259,
                "speed": 57.96137,
            },
        },
        "meta": {"nonsense": "MMMMMMMMMM"},
    }
)

ctx = Context()

if DEMO:
    import os
    import tempfile
    import time

    # deterministic nested event generator (emit_measurements stand-in)
    stream_dir = tempfile.mkdtemp(prefix="rideshare_")
    t0 = 1715201766763
    for chunk in range(3):
        path = os.path.join(stream_dir, f"events_{chunk}.json")
        with open(path, "w") as fh:
            for i in range(200):
                ev = json.loads(sample_event)
                ev["driver_id"] = f"driver-{(chunk * 200 + i) % 4}"
                ev["occurred_at_ms"] = t0 + (chunk * 200 + i) * 25
                ev["imu_measurement"]["gps"]["speed"] = 40.0 + (i % 50)
                ev["imu_measurement"]["gps"]["altitude"] = 2.0 + (i % 7)
                fh.write(json.dumps(ev) + "\n")
        mt = time.time() - 60 + chunk * 20
        os.utime(path, (mt, mt))  # FileStreamSource orders by mtime

    schema = infer_schema_from_json(sample_event)
    ds = ctx.from_stream_json(
        stream_dir, schema, max_files_per_trigger=1
    ).with_timestamp("occurred_at_ms", "ms")
else:
    ds = ctx.from_topic(
        "driver-imu-data",
        sample_event,
        bootstrap_servers,
        "occurred_at_ms",
        group_id="test",
        starting_offsets="earliest",
    )

windowed = ds.window(
    [col("driver_id")],
    [
        f.max(col("imu_measurement.gps.speed")).alias("max_speed"),
        f.min(col("imu_measurement.gps.altitude")).alias("min_altitude"),
        f.count(col("imu_measurement")).alias("count"),
    ],
    5_000,  # 5 second window
    1_000,  # 1 second slide
)

if DEMO:
    q = windowed.sink(lambda df: print(df.orderBy("window_start_time", "driver_id").collect()[:4]))
    q.awaitTermination(120)
else:
    windowed.sink_kafka(bootstrap_servers, "out_topic").awaitTermination()
