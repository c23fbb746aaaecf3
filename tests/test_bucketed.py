"""Bucketed co-located joins: the sha256-identity join of two
co-bucketed tables must plan WITHOUT any Exchange (the 100 TB
shuffle-elimination claim of SURVEY §4)."""

from pyspark.sql import functions as F

from surfactant_spark.sources.bucketed import cobucketed_join, write_bucketed


def test_cobucketed_join_has_no_exchange(spark):
    # managed tables land in the session's spark-warehouse and are
    # deleted by DROP TABLE below (warehouse.dir is a static conf)
    nodes = spark.range(500).select(
        F.sha2(F.col("id").cast("string"), 256).alias("sha256"),
        F.col("id").alias("n"),
    )
    sightings = spark.range(2000).select(
        F.sha2((F.col("id") % 500).cast("string"), 256).alias("sha256"),
        F.col("id").alias("sighting"),
    )
    write_bucketed(nodes, "b_nodes", "sha256", n_buckets=8)
    write_bucketed(sightings, "b_sightings", "sha256", n_buckets=8)

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = cobucketed_join(spark, "b_sightings", "b_nodes", "sha256")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, "co-bucketed join must not shuffle"
        # and it is correct
        assert joined.count() == 2000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS b_nodes")
        spark.sql("DROP TABLE IF EXISTS b_sightings")
