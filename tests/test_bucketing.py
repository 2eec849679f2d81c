"""Bucketed serving tables: joins on the bucket key run WITHOUT a shuffle —
the 100 TB co-location strategy claimed in SCALE.md, proven on the plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def no_broadcast(spark):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_has_no_exchange(spark, no_broadcast):
    a = spark.range(20000).select((F.col("id") % 97).alias("k"), F.col("id").alias("va"))
    b = spark.range(20000).select((F.col("id") % 97).alias("k"), F.col("id").alias("vb"))
    a.write.bucketBy(8, "k").sortBy("k").mode("overwrite").saveAsTable("bt_a")
    b.write.bucketBy(8, "k").sortBy("k").mode("overwrite").saveAsTable("bt_b")
    try:
        j = spark.table("bt_a").join(spark.table("bt_b"), "k")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan  # co-located: no shuffle
        # sanity: result matches the shuffled join
        assert j.count() == 20000 * (20000 // 97 + (0 if 20000 % 97 == 0 else 1)) or j.count() > 0
        plain = a.join(b, "k").count()
        assert j.count() == plain
    finally:
        spark.sql("DROP TABLE IF EXISTS bt_a")
        spark.sql("DROP TABLE IF EXISTS bt_b")


def test_bucketed_groupby_has_no_exchange(spark):
    df = spark.range(20000).select((F.col("id") % 97).alias("k"), F.col("id").alias("v"))
    df.write.bucketBy(8, "k").sortBy("k").mode("overwrite").saveAsTable("bt_g")
    try:
        agg = spark.table("bt_g").groupBy("k").agg(F.sum("v").alias("s"))
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan
        assert agg.count() == 97
    finally:
        spark.sql("DROP TABLE IF EXISTS bt_g")
