"""metric_monitoring_suite — the round-11 statistical-monitoring
operators composed into one operational run over the events table:
Mann-Kendall trend verdicts, the EWMA control chart with a Phase-I
calibration window, Kaplan-Meier signup→error survival, the
seasonal-naive MASE forecastability gate, the click↔purchase
cross-correlation lead/lag probe, and the CUPED variance-reduced
experiment readout.

    PYTHONPATH=. python examples/metric_monitoring_suite.py [sf_dir]

Every number printed here is oracle-checked by the corresponding
driver entries (events_mann_kendall / events_ewma_daily /
events_survival_km / events_forecast_mase / events_ccf_click_purchase
/ events_ab_cuped); this script is the operational composition.
"""

import sys

from pyspark.sql import functions as F

from denormalized_spark import Context
from denormalized_spark.operators.analytics import (
    cross_correlation,
    cuped_adjustment,
    ewma_control,
    kaplan_meier,
    mann_kendall,
    seasonal_naive_mase,
)

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

ctx = Context(app_name="metric_monitoring_suite")
events = ctx.from_parquet(f"{sf_dir}/events.parquet").df

cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
daily = (
    events.select(
        "event_type", F.col("ts").cast("date").alias("day"), cents.alias("_c")
    )
    .groupBy("event_type", "day")
    .agg(F.sum("_c").alias("cents"))
    .localCheckpoint()  # the series feeds four operators below
)

print("== Mann-Kendall trend verdicts (daily revenue cents) ==")
for r in mann_kendall(daily, "event_type", "day", "cents").orderBy(
    "event_type"
).collect():
    print(
        f"  {r['event_type']:9s} S={r['s_stat']:5d} z={r['z_micro'] / 1e6:+.3f} "
        f"trend={r['trend']:10s} sen_slope={r['sen_slope_micro'] / 1e6:+.1f}/day"
    )

print("== EWMA control chart breaches (Phase-I: first 15 days) ==")
chart = ewma_control(
    daily, "event_type", "day", "cents",
    baseline=F.col("day") < F.lit("2024-01-16").cast("date"),
)
breaches = chart.filter("breach").orderBy("event_type", "day").collect()
print(f"  {len(breaches)} breach day(s)")
for r in breaches[:5]:
    print(
        f"  {r['event_type']:9s} {r['day']} dev={r['dev_micro'] / 1e6:.0f} "
        f"limit={r['limit_micro'] / 1e6:.0f}"
    )

print("== Kaplan-Meier signup→first-error survival ==")
t0 = (
    events.filter(F.col("event_type") == "signup")
    .groupBy("user_id")
    .agg(F.min("ts").alias("_t0"))
)
te = (
    events.join(t0, "user_id")
    .filter((F.col("event_type") == "error") & (F.col("ts") > F.col("_t0")))
    .groupBy("user_id")
    .agg(F.min("ts").alias("_te"))
)
mx = events.agg(F.max("ts").alias("_m"))
subj = (
    t0.join(te, "user_id", "left")
    .crossJoin(F.broadcast(mx))
    .select(
        F.when(
            F.col("_te").isNotNull(),
            F.datediff(F.col("_te").cast("date"), F.col("_t0").cast("date")),
        )
        .otherwise(F.datediff(F.col("_m").cast("date"), F.col("_t0").cast("date")))
        .cast("long")
        .alias("dur"),
        F.when(F.col("_te").isNotNull(), 1).otherwise(0).alias("ev"),
    )
)
for r in kaplan_meier(subj, "dur", "ev").orderBy("t").collect()[:8]:
    print(
        f"  day {r['t']:3d} at_risk={r['n_risk']:4d} events={r['n_events']:3d} "
        f"S(t)={r['survival_micro'] / 1e6:.4f}"
    )

print("== seasonal-naive MASE (does anything beat the weekly naive?) ==")
for r in seasonal_naive_mase(daily, "event_type", "day", "cents").orderBy(
    "event_type"
).collect():
    verdict = "forecastable" if 0 <= r["mase_milli"] < 1000 else "naive wins"
    print(f"  {r['event_type']:9s} MASE={r['mase_milli'] / 1000:.2f} ({verdict})")

print("== click↔purchase cross-correlation (lead/lag) ==")
ccf_series = (
    events.groupBy(F.col("ts").cast("date").alias("day"))
    .agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("long").alias("x"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long").alias("y"),
    )
)
rows = cross_correlation(ccf_series, "day", "x", "y", max_lag=3).collect()
best = max(rows, key=lambda r: r["ccf_micro"])
for r in rows:
    mark = "  <- peak" if r["lag"] == best["lag"] else ""
    print(f"  lag {r['lag']:+d}: r={r['ccf_micro'] / 1e6:+.3f}{mark}")

print("== CUPED experiment readout (variant = user parity) ==")
cut = F.lit("2024-01-16").cast("date").cast("timestamp")
is_p = F.col("event_type") == "purchase"
units = events.groupBy("user_id").agg(
    F.max(F.col("user_id") % 2).alias("v"),
    F.sum(F.when(is_p & (F.col("ts") < cut), cents).otherwise(0))
    .cast("long").alias("x"),
    F.sum(F.when(is_p & (F.col("ts") >= cut), cents).otherwise(0))
    .cast("long").alias("y"),
)
r = cuped_adjustment(units, "v", "x", "y").collect()[0]
print(
    f"  n_a={r['n_a']} n_b={r['n_b']} theta={r['theta_micro'] / 1e6:.3f}\n"
    f"  raw diff   = {r['diff_raw_micro'] / 1e6:+.1f} cents/user\n"
    f"  CUPED diff = {r['diff_cuped_micro'] / 1e6:+.1f} cents/user "
    f"(variance reduced {r['var_reduction_micro'] / 1e4:.1f}%)"
)

print("monitoring suite complete")
ctx.spark.stop()
