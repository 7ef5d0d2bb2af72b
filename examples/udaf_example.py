"""udaf_example — 1:1 translation of the reference's
py-denormalized/python/examples/udaf_example.py: a user-defined
aggregate with MAP-TYPED state through the Accumulator protocol
(state/update/merge/evaluate), applied per event-time window.

``--demo`` runs the same windowed UDAF on a batch backfill of the
events table (continuous-stream custom state lives in
``applyInPandasWithState`` — see streaming/stateful.py):

    python examples/udaf_example.py --demo
"""

import json
import signal
import sys
from collections import Counter
from typing import List

import pyarrow as pa

from denormalized_spark import Context
from denormalized_spark.datafusion import Accumulator, udaf
from denormalized_spark.udf import window_udaf

signal.signal(signal.SIGINT, lambda sig, frame: sys.exit(0))

DEMO = "--demo" in sys.argv

bootstrap_server = "localhost:9092"

sample_event = {
    "occurred_at_ms": 100,
    "sensor_name": "foo",
    "reading": 0.0,
}


class TotalValuesRead(Accumulator):
    # Define the state type as a struct containing a map
    acc_state_type = pa.struct([("counts", pa.map_(pa.string(), pa.int64()))])

    def __init__(self):
        self.counts = Counter()

    def update(self, values: pa.Array) -> None:
        if values is not None:
            self.counts.update(values.to_pylist())

    def merge(self, states: pa.Array) -> None:
        if states is None or len(states) == 0:
            return
        for state in states:
            if state is not None:
                counts_map = state.to_pylist()[0]
                for k, v in counts_map["counts"]:
                    self.counts[k] += v

    def state(self) -> List[pa.Scalar]:
        result = {"counts": dict(self.counts.items())}
        return [pa.scalar(result, type=self.acc_state_type)]

    def evaluate(self) -> pa.Scalar:
        return self.state()[0]


input_type = [pa.string()]
return_type = TotalValuesRead.acc_state_type
state_type = [TotalValuesRead.acc_state_type]
sample_udaf = udaf(TotalValuesRead, input_type, return_type, state_type, "stable")


ctx = Context()

if DEMO:
    ds = (
        ctx.from_parquet("/root/testdata/sf0.001/events.parquet", event_time="ts")
        .with_column_renamed("event_type", "sensor_name")
    )
    out = window_udaf(
        ds, sample_udaf, "sensor_name", [], 6 * 3600_000, alias="count"
    )
    out.orderBy("window_start_time").show(10, truncate=False)
else:
    ds = ctx.from_topic(
        "temperature", json.dumps(sample_event), bootstrap_server, "occurred_at_ms"
    )
    # Per micro-batch the stream is a plain DataFrame, so the batch
    # windowed-UDAF plan applies as-is inside the sink. (Cross-batch
    # accumulator state — exactly the reference's continuous mode —
    # belongs to applyInPandasWithState; see streaming/stateful.py.)
    query = ds.sink(
        lambda df: print(
            window_udaf(
                Context(ctx.spark).from_batch(df, event_time=ds.event_time),
                sample_udaf,
                "sensor_name",
                [],
                2000,
                alias="count",
            ).collect()[:5]
        )
    )
    query.awaitTermination()
