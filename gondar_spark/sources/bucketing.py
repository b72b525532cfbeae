"""Bucketed tables: co-located joins/aggregations without a shuffle.

At 100 TB the dominant cost of repeated joins on the same key (e.g.
mentions->entity_id, triples->subj) is re-shuffling the fact table every
query. Writing both sides bucketed by the join key with the same bucket
count lets Spark's bucketed-scan rule join them with ZERO Exchange —
the shuffle is paid once at write time, amortized over every later join.

Parquet bucketing needs the session catalog (saveAsTable), not bare
parquet paths; tables are external (explicit path) so they live in the
caller's warehouse directory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_by: str,
    n_buckets: int = 16,
    sort_by: str | None = None,
) -> None:
    writer = (
        df.write.mode("overwrite")
        .option("path", path)
        .bucketBy(n_buckets, bucket_by)
    )
    if sort_by:
        writer = writer.sortBy(sort_by)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
