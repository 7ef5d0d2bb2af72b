"""Scale-safe global ranking vs the naive unpartitioned window."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from denormalized_spark.operators.ranking import global_ranks, with_global_row_number


def test_global_row_number_matches_naive(spark):
    df = spark.createDataFrame(
        [(i % 7, i) for i in range(200)], ["v", "id"]
    ).repartition(8)
    order = [F.desc("v"), F.asc("id")]
    got = {
        r["id"]: r["row_number"]
        for r in with_global_row_number(df, order, num_partitions=5).collect()
    }
    naive = {
        r["id"]: r["rn"]
        for r in df.select(
            "id", F.row_number().over(Window.orderBy(*order)).alias("rn")
        ).collect()
    }
    assert got == naive


@pytest.mark.parametrize("n,k", [(200, 4), (10, 3), (3, 5), (1, 4)])
def test_global_ranks_match_naive(spark, n, k):
    df = spark.createDataFrame([(i % 11, i) for i in range(n)], ["v", "id"])
    order = [F.asc("v"), F.asc("id")]
    got = {
        r["id"]: (r[f"ntile_{k}"], r["percent_rank"], r["cume_dist"], r["rank"])
        for r in global_ranks(
            df, order, rank_keys=["v", "id"], ntile=k, num_partitions=4
        ).collect()
    }
    w = Window.orderBy(*order)
    naive = {
        r["id"]: (r["nt"], r["pr"], r["cd"], r["rk"])
        for r in df.select(
            "id",
            F.ntile(k).over(w).alias("nt"),
            F.percent_rank().over(w).alias("pr"),
            F.cume_dist().over(w).alias("cd"),
            F.rank().over(w).alias("rk"),
        ).collect()
    }
    for i in got:
        assert got[i][0] == naive[i][0], (i, "ntile")
        assert got[i][1] == pytest.approx(naive[i][1]), (i, "percent_rank")
        assert got[i][2] == pytest.approx(naive[i][2]), (i, "cume_dist")
        assert got[i][3] == naive[i][3], (i, "rank")


def test_global_ranks_ties_share_rank(spark):
    df = spark.createDataFrame([(1, 1), (1, 2), (2, 3)], ["v", "id"])
    got = {
        r["id"]: (r["rank"], r["percent_rank"])
        for r in global_ranks(
            df, [F.asc("v"), F.asc("id")], rank_keys=["v"], num_partitions=2
        ).collect()
    }
    assert got[1][0] == got[2][0] == 1  # tie on v=1
    assert got[3][0] == 3
    assert got[1][1] == got[2][1] == 0.0


def test_no_single_partition_sort_of_data(spark):
    """The data path must contain no unpartitioned Window: the only
    global sort is over the numPartitions-row offsets relation."""
    df = spark.range(1000).withColumn("v", F.col("id") % 13)
    out = with_global_row_number(df, [F.asc("v"), F.asc("id")], num_partitions=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in plan.lower()
    # naive plan for comparison: a SinglePartition exchange feeding
    # the Window over the full data
    naive = df.select(F.row_number().over(Window.orderBy("v", "id")))
    naive_plan = naive._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" in naive_plan  # sanity: naive IS the bad plan
    # our data-side window partitions by spark_partition_id
    assert "_rank_pid" in plan
