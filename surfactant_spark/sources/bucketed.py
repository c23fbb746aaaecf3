"""Bucketed table helpers — shuffle-free co-located joins at scale.

SURVEY §4 commits the engine to bucketing the node table by content
hash so downstream joins on sha256 need no exchange. Parquet path
writes cannot carry bucket metadata, so these helpers go through the
session catalog (`saveAsTable`), which is exactly how a warehouse
deployment would register the tables; the Iceberg equivalent is
`bucket(N, sha256)` partition transforms.

`tests/test_bucketed.py` asserts the join plan of two co-bucketed
tables contains NO Exchange — the property that turns the hash-identity
join (J5) into a map-side merge at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame, table: str, key: str, n_buckets: int = 16, sort: bool = True
) -> None:
    """Register ``df`` as a bucketed (and bucket-sorted) catalog table."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def cobucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str, how: str = "inner"
) -> DataFrame:
    """Join two co-bucketed tables on their bucket key. With equal
    bucket counts Spark plans a sort-merge join with NO exchange on
    either side (set spark.sql.autoBroadcastJoinThreshold=-1 to see it
    on small test data; at scale the sizes preclude broadcast anyway)."""
    return read_table(spark, left_table).join(read_table(spark, right_table), key, how)
