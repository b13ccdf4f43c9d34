"""DataFrame sinks: parquet/CSV/JSON writers, hive-style partitioning,
and bucketed tables for shuffle-free co-located joins.

The reference's only tabular sink is a space-delimited CSV (or one file
per key) written on the driver (reference: mr/result_writers/file.py:
10-52 — covered for MR-parity by jobx_spark.result_writers). These are
the *distributed* sinks: executors write in parallel, so throughput
scales with the cluster, and layout choices made here (partition
columns, bucket counts) are what later queries' partition pruning and
join planning feed on.

Layout guidance encoded in the API:
  * ``partition_by`` — low-cardinality columns queries filter on;
    every partition becomes a directory, so 10-10k values is the
    useful range (a billion tiny dirs is worse than none).
  * ``write_bucketed`` — pre-shuffle the table ONCE by the join/agg
    key; every later join between tables bucketed on the same key with
    the same count runs with zero exchanges. At 100 TB, bucket counts
    should put one bucket at 100-500 MB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_csv(
    df: DataFrame, path: str, header: bool = True, mode: str = "overwrite"
) -> None:
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int,
    path: str | None = None,
    sort_by: str | None = None,
) -> None:
    """Persist as a bucketed (and bucket-sorted) table.

    Both sides of a frequent join written with the same (column, count)
    make the join exchange-free: Spark reads matching buckets
    pair-wise. ``sort_by`` additionally pre-sorts within buckets so a
    sort-merge join skips its sort.
    """
    w = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_by:
        w = w.sortBy(sort_by)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table_name)


def drop_table(spark: SparkSession, table_name: str) -> None:
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
