"""Table loaders and format scans.

The reference engine's only data source is the HTTP ``arguments`` dict
(reference: mr/views/job.py:18-31); file formats appear only as output
sinks. Our engine fronts Spark's native readers instead, so every
format Spark reads is a first-class source, with explicit schemas for
the driver-generated testdata tables so scans prune columns and push
predicates into the parquet footers.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table. Parquet scan → Catalyst gets pushdown,
    pruning and row-group skipping for free; never cache here (caching
    100 TB is not a plan).

    ``events.ts`` is written as TIMESTAMP(NANOS), which Spark's vectorized
    parquet reader rejects; we read nanos as raw INT64 and truncate to
    microseconds — exactly what DuckDB does when it casts TIMESTAMP_NS
    to its microsecond TIMESTAMP, so both engines see identical values.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every testdata table as a temp view for the SQL surface.

    Views are lazy — registration costs only a footer read, so
    re-registering per query call is cheap and keeps each call
    self-contained (the driver calls ``queries()[name](spark, sf_dir)``
    with fresh sessions/dirs).
    """
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs


def read_csv(spark: SparkSession, path: str, schema=None, header: bool = True) -> DataFrame:
    """CSV scan. Schema should be supplied at scale (inference reads the
    data twice)."""
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def read_json(spark: SparkSession, path: str, schema=None) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan — same columnar pushdown/pruning contract as parquet
    (Spark's native vectorized ORC reader)."""
    return spark.read.orc(path)


def read_text(spark: SparkSession, path: str, wholetext: bool = False) -> DataFrame:
    """Line-oriented (or whole-file) text scan → one ``value`` string
    column; the raw-corpus entry point before tokenization. Each file
    splits by line across tasks unless ``wholetext`` forces
    file-per-row (then parallelism = file count — only for small-doc
    layouts). NB: must be the ``text()`` kwarg — a ``.option()`` string
    is silently ignored by Spark 4's reader."""
    return spark.read.text(path, wholetext=wholetext)


def read_binary_files(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """Binary-file scan (images/audio/model shards): one row per file
    with (path, modificationTime, length, content BINARY) via Spark's
    built-in ``binaryFile`` source — the real-ingest entry point for
    the multimodal asset pipeline (operators/multimodal.py normalizes
    into the asset convention from here).

    Scale notes: each file is one row read whole into ``content``, so
    parallelism = file count and executor memory bounds file size —
    right for the many-small-assets layout (images, audio clips);
    for giant files use a format-aware splitter instead. Pushdown: a
    ``length < N`` filter prunes at the listing level; pair with
    ``pathGlobFilter`` to skip non-asset files without opening them.
    """
    reader = spark.read.format("binaryFile")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)
