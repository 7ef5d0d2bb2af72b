"""Feast feature-store sink (reference
py-denormalized/python/denormalized/feast_data_stream.py:100-123).

The reference pushes each emitted batch to a Feast online store via
``store.push(push_source_name, batch_df)``. On Spark that is exactly a
``foreachBatch`` sink — this module is the documented recipe, gated on
the optional feast dependency (not installed in this container).

Usage::

    from feast import FeatureStore
    from denormalized_spark.sources.feast import write_feast_feature

    store = FeatureStore(repo_path=".")
    query = write_feast_feature(
        ds.window(["sensor"], [f.avg("reading").alias("avg_reading")], 60_000),
        store,
        push_source_name="sensor_push_source",
        checkpoint="/ckpt/feast_sink",
    )

Scale notes: the push happens per micro-batch per *driver* in this
recipe (small aggregated outputs — the normal case for feature
materialization), in bounded pandas chunks (``max_rows_per_push``)
so a fat batch after downtime recovery can't blow driver memory with
one giant ``toPandas``. For very large batches, push from executors
with ``foreachPartition`` inside the batch function instead.
"""

from __future__ import annotations

from typing import Any


def write_feast_feature(
    ds,
    feature_store: Any,
    push_source_name: str,
    *,
    checkpoint: str | None = None,
    trigger: dict | None = None,
    to: str = "online",
    max_rows_per_push: int = 50_000,
):
    """Stream (or batch-backfill) a DataStream into a Feast push source.

    Mirrors ``FeastDataStream.write_feast_feature`` (reference
    feast_data_stream.py:100-123): each emitted batch is converted to
    pandas and pushed. Works for batch DataStreams too (single push).

    The conversion is CHUNKED: rows stream to the driver one
    partition at a time (``toLocalIterator``) and are pushed in
    pandas frames of at most ``max_rows_per_push`` rows — one
    ``store.push`` per chunk — so driver memory is bounded by
    max(partition size, chunk size) even for the fat micro-batch a
    restarted stream replays after downtime.
    """
    if to not in ("online", "offline", "both"):
        raise ValueError(f"to must be online/offline/both, got {to!r}")
    if max_rows_per_push < 1:
        raise ValueError("max_rows_per_push must be >= 1")
    mode = _resolve_push_mode(to)

    def push_batch(batch_df, _epoch=None):
        cols = batch_df.columns
        schema = batch_df.schema
        buf: list = []
        for row in batch_df.toLocalIterator():
            buf.append(row)
            if len(buf) >= max_rows_per_push:
                feature_store.push(
                    push_source_name, _chunk_frame(buf, cols, schema), to=mode
                )
                buf = []
        if buf:
            feature_store.push(
                push_source_name, _chunk_frame(buf, cols, schema), to=mode
            )

    return ds.sink(push_batch, checkpoint=checkpoint, trigger=trigger)


_PANDAS_DTYPE = {
    "ByteType": "Int8",
    "ShortType": "Int16",
    "IntegerType": "Int32",
    "LongType": "Int64",
    "FloatType": "float32",
    "DoubleType": "float64",
    "BooleanType": "boolean",
    "StringType": "string",
}


def _chunk_frame(rows, cols, schema):
    """Build a pandas frame for one push chunk with dtypes pinned to
    the BATCH schema, not re-inferred per chunk. Each column is built
    DIRECTLY from the row values with its target dtype — never
    through ``from_records`` + ``astype``, whose float64 intermediate
    for an int column containing a NULL silently corrupts values
    above 2^53 (2^53+1 → 2^53) before the Int64 cast runs. Numeric/
    bool columns get the matching NULLABLE pandas dtype from python
    scalars, timestamps/dates become datetime64, strings the nullable
    ``string`` dtype; arrays/maps/structs stay object (the
    pandas-native shape)."""
    import pandas as pd

    kinds = {f.name: type(f.dataType).__name__ for f in schema.fields}
    data = {}
    for idx, name in enumerate(cols):
        values = [row[idx] for row in rows]
        kind = kinds.get(name)
        if kind in ("TimestampType", "TimestampNTZType", "DateType"):
            data[name] = pd.Series(pd.to_datetime(values))
        elif kind in _PANDAS_DTYPE:
            data[name] = pd.array(values, dtype=_PANDAS_DTYPE[kind])
        else:
            data[name] = pd.Series(values, dtype=object)
    return pd.DataFrame(data, columns=list(cols))


def _resolve_push_mode(to: str):
    """Map the ``to`` keyword to feast's PushMode enum. Falls back to
    the plain string when feast isn't installed, so the per-batch push
    contract (batch → pandas → ``store.push``) stays testable against
    a stand-in store without the optional dependency."""
    try:
        from feast.data_source import PushMode
    except ImportError:  # optional dependency absent: string-mode contract
        return to
    return {
        "online": PushMode.ONLINE,
        "offline": PushMode.OFFLINE,
        "both": PushMode.ONLINE_AND_OFFLINE,
    }[to]
