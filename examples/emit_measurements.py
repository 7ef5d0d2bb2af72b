"""emit_measurements — translation of the reference's
examples/examples/emit_measurements.rs: generate sensor readings for
the `temperature` and `humidity` topics consumed by the other
examples.

With a broker (`docker run -p 9092:9092 apache/kafka`) it produces to
Kafka via kafka-python if installed. ``--dir OUT`` writes the same
stream as time-ordered NDJSON files instead — the file-stream input
for the examples' ``--demo`` modes:

    python examples/emit_measurements.py --dir /tmp/measurements
"""

import json
import os
import random
import sys
import time

SENSORS = [f"sensor_{i}" for i in range(10)]


def make_event() -> tuple[str, dict]:
    sensor_name = random.choice(SENSORS)
    if random.random() < 0.4:
        return "temperature", {
            "occurred_at_ms": int(time.time() * 1000),
            "sensor_name": sensor_name,
            "reading": random.random() * 115.0,
        }
    return "humidity", {
        "occurred_at_ms": int(time.time() * 1000),
        "sensor_name": sensor_name,
        "reading": random.random(),
    }


def emit_to_files(out_dir: str, n_files: int = 5, per_file: int = 500) -> None:
    for topic in ("temperature", "humidity"):
        os.makedirs(os.path.join(out_dir, topic), exist_ok=True)
    now = time.time()
    for i in range(n_files):
        fhs = {
            t: open(os.path.join(out_dir, t, f"chunk_{i}.json"), "w")
            for t in ("temperature", "humidity")
        }
        for _ in range(per_file):
            topic, ev = make_event()
            fhs[topic].write(json.dumps(ev) + "\n")
        for t, fh in fhs.items():
            fh.close()
            path = os.path.join(out_dir, t, f"chunk_{i}.json")
            mt = now - (n_files - i) * 10  # mtime order = micro-batch order
            os.utime(path, (mt, mt))
    print(f"wrote {n_files} chunks x {per_file} events per topic under {out_dir}")


def emit_to_kafka(bootstrap: str = "localhost:9092") -> None:
    try:
        from kafka import KafkaProducer  # optional; not in this container
    except ImportError:
        sys.exit("kafka-python not installed; use --dir OUT for file output")
    producer = KafkaProducer(bootstrap_servers=bootstrap)
    while True:
        topic, ev = make_event()
        producer.send(topic, json.dumps(ev).encode())


if __name__ == "__main__":
    if "--dir" in sys.argv:
        emit_to_files(sys.argv[sys.argv.index("--dir") + 1])
    else:
        emit_to_kafka()
