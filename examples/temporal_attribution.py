"""temporal_attribution — the time-series join suite over the events
stream in one run: point-in-time as-of lookups in all three
directions (backward / forward-with-window / nearest), interval
attribution via the binned range join, resampling with forward fill
AND linear interpolation, and the Z-order write layout that makes the
resulting table prunable on two columns at once.

    PYTHONPATH=. python examples/temporal_attribution.py [sf_dir]

Every number printed here is oracle-checked by the corresponding
driver entries (join_asof_purchase_click / join_asof_forward_conversion
/ join_asof_nearest_click / join_range_order_bursts /
window_resample_ffill / window_resample_interp / layout_zorder_events);
this script is the operational composition. The STREAMING twins
(asof_join_stream with the tolerance-as-horizon directions,
range_join_stream with native watermark eviction) run in
tests/test_stateful.py and tests/test_streaming.py.
"""

import sys
import tempfile

from pyspark.sql import functions as F

from denormalized_spark import Context
from denormalized_spark.operators.layout import zorder_repartition
from denormalized_spark.operators.temporal import (
    asof_join,
    interpolate_linear,
    resample,
)

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

ctx = Context(app_name="temporal_attribution")
events = ctx.from_parquet(f"{sf_dir}/events.parquet").df

purchases = events.filter(F.col("event_type") == "purchase").select(
    "event_id", "user_id", "ts", F.round("value", 2).alias("purchase_value")
)
clicks = (
    events.filter(F.col("event_type") == "click")
    .groupBy("user_id", "ts")
    .agg(F.round(F.max("value"), 2).alias("click_value"))
)

print("== backward as-of: last click at-or-before each purchase ==")
back = asof_join(
    purchases, clicks, on=["user_id"], left_time="ts", right_time="ts",
    right_cols=["click_value"], matched_time_col="click_ts",
)
n_total = back.count()
n_matched = back.filter(F.col("click_ts").isNotNull()).count()
print(f"  purchases={n_total}  with a prior click={n_matched}")

print("== forward as-of + 24h window: click -> next purchase ==")
fwd = asof_join(
    clicks.select(
        F.monotonically_increasing_id().alias("cid"), "user_id", "ts",
        "click_value",
    ),
    purchases.groupBy("user_id", "ts").agg(
        F.round(F.max("purchase_value"), 2).alias("pv")
    ),
    on=["user_id"], left_time="ts", right_time="ts", right_cols=["pv"],
    direction="forward", tolerance_ms=86_400_000,
    matched_time_col="purchase_ts",
)
conv = fwd.filter(F.col("purchase_ts").isNotNull()).count()
print(f"  clicks={fwd.count()}  converted within 24h={conv}")

print("== nearest as-of (pandas merge_asof parity, ties backward) ==")
near = asof_join(
    purchases, clicks, on=["user_id"], left_time="ts", right_time="ts",
    right_cols=["click_value"], direction="nearest",
    matched_time_col="click_ts",
)
gap = near.filter(F.col("click_ts").isNotNull()).select(
    F.avg(
        F.abs(
            F.unix_millis(F.col("ts")) - F.unix_millis(F.col("click_ts"))
        )
    ).alias("avg_gap_ms")
).collect()[0]["avg_gap_ms"]
print(f"  mean |gap| to the nearest click: {gap / 60000:.1f} min")

print("== resample 6h: forward fill vs linear interpolation ==")
cents = F.round(F.col("value") * 100).cast("long")
grid = resample(
    events, "ts", 6 * 3600_000, ["event_type"],
    [F.count("*").alias("cnt"), F.sum(cents).alias("cs")],
)
binned = grid.select(
    "event_type", "bin_start",
    F.coalesce("cnt", F.lit(0)).cast("long").alias("n"),
    F.expr("(cs * 100) div cnt").alias("avg_e4"),
)
interp = interpolate_linear(binned, ["event_type"], "bin_start", ["avg_e4"])
empty = binned.filter(F.col("n") == 0).count()
filled = interp.filter((F.col("n") == 0) & F.col("avg_e4").isNotNull()).count()
print(f"  empty bins={empty}  linearly interpolated={filled} "
      "(edges stay NULL by design)")

print("== Z-order write layout over (user_id, value) ==")
out_dir = tempfile.mkdtemp(prefix="zorder_events_")
zorder_repartition(
    events.select("event_id", "user_id", "ts", "value"),
    ["user_id", "value"], num_partitions=8,
).write.mode("overwrite").parquet(out_dir)
files = ctx.spark.read.parquet(out_dir)
print(f"  wrote {files.count()} rows z-ordered to {out_dir} "
      "(row-group skip-rate win measured in tests/test_layout.py)")

print("temporal attribution report complete")
