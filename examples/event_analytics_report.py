"""event_analytics_report — the full behavioral-analytics suite over
an event stream in one run: conversion funnel (global + in-session),
weekly cohort retention, the Markov transition matrix, and the causal
per-window anomaly screen — everything a product-analytics pipeline
computes downstream of the reference's windowed aggregation.

    PYTHONPATH=. python examples/event_analytics_report.py [sf_dir]

Every number printed here is oracle-checked by the corresponding
driver entries (events_funnel / events_session_funnel /
events_cohort_retention / events_transitions / events_anomaly_online);
this script is the operational composition.
"""

import sys

from pyspark.sql import functions as F

from denormalized_spark import Context
from denormalized_spark.operators.analytics import (
    anomaly_online_batch,
    cohort_retention,
    event_transitions,
    funnel_counts,
    session_funnel,
)

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

ctx = Context(app_name="event_analytics_report")
events = ctx.from_parquet(f"{sf_dir}/events.parquet").df

print("== conversion funnel (first 2 days, strict order) ==")
two_days = events.filter(F.col("ts") < "2024-01-03")
for r in funnel_counts(two_days, ["view", "click", "purchase"]).collect():
    print(f"  step {r['step']} {r['step_name']:9s} users={r['n_users']:4d} "
          f"rate={r['conversion_rate']:.3f}")

print("== same funnel, within one 30-min session ==")
for r in session_funnel(
    two_days, ["view", "click", "purchase"], gap_ms=1_800_000
).collect():
    print(f"  step {r['step']} {r['step_name']:9s} sessions={r['n_sessions']:4d} "
          f"rate={r['conversion_rate']:.3f}")

print("== weekly purchase-cohort retention ==")
purchases = events.filter(F.col("event_type") == "purchase")
for r in cohort_retention(purchases).collect():
    print(f"  cohort {r['cohort']:%Y-%m-%d} +{r['offset']}w "
          f"active={r['n_active']:4d} rate={r['retention_rate']:.3f}")

print("== top event-type transitions (2h continuation gap) ==")
trans = event_transitions(events, gap_ms=7_200_000)
for r in trans.orderBy(F.desc("n")).limit(5).collect():
    print(f"  {r['from_type']:9s} -> {r['to_type']:9s} n={r['n']:5d} p={r['p']:.3f}")

print("== causal hourly volume anomalies (|z| >= 3) ==")
anom = anomaly_online_batch(events, "event_type", "ts", 3600_000)
flagged = anom.filter("is_anomaly").collect()
print(f"  {anom.count()} scored windows, {len(flagged)} flagged")
for r in flagged[:5]:
    print(f"  {r['event_type']} @ {r['window_start_time']} n={r['n']} z={r['zscore']}")
print("report complete")
