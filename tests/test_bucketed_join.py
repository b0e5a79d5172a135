"""Bucketed co-located join (SCALE.md claim): writing both sides
bucketed by the join key removes the shuffle entirely — the production
plan for cell-keyed joins when the catalog outgrows broadcast."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force non-broadcast
    spark.sql("CREATE DATABASE IF NOT EXISTS btest")

    pts = spark.range(100000).selectExpr("id AS point_id", "CAST(id % 977 AS LONG) AS cell")
    cat = spark.range(5000).selectExpr("id AS patch_id", "CAST(id % 977 AS LONG) AS cell")
    (
        pts.write.mode("overwrite").bucketBy(16, "cell").sortBy("cell")
        .saveAsTable("btest.pts_bucketed")
    )
    (
        cat.write.mode("overwrite").bucketBy(16, "cell").sortBy("cell")
        .saveAsTable("btest.cat_bucketed")
    )
    j = spark.table("btest.pts_bucketed").join(spark.table("btest.cat_bucketed"), "cell")
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan[:2000]  # co-located: zero shuffle
    # and it still computes the right thing
    n = j.count()
    want = (
        pts.groupBy("cell").count().withColumnRenamed("count", "a")
        .join(cat.groupBy("cell").count().withColumnRenamed("count", "b"), "cell")
        .agg(F.sum(F.col("a") * F.col("b"))).collect()[0][0]
    )
    assert n == want
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
