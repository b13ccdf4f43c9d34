"""Structured Streaming operators (tumbling/sliding/session windows,
applyInPandasWithState) run to completion via AvailableNow and compared
against the DuckDB batch oracle."""

import pytest

from jobx_spark.oracle import compare, duck_connect
from jobx_spark.queries import streams


@pytest.fixture(scope="module")
def duck(sf_dir):
    return duck_connect(sf_dir)


@pytest.mark.parametrize("name", sorted(streams.QUERIES))
def test_streaming_query_matches_oracle(name, spark, sf_dir, duck):
    df = streams.QUERIES[name](spark, sf_dir)
    res = compare(name, df, duck, streams.ORACLES[name])
    assert res.ok, str(res)


def test_foreach_batch_parquet_sink_is_idempotent(spark, sf_dir, tmp_path):
    """stream → foreachBatch parquet sink: content matches the batch
    filter, and a second run from the same checkpoint (no new input)
    replays nothing — the exactly-once contract."""
    from pyspark.sql import functions as F

    from jobx_spark.sources import load_table
    from jobx_spark.streaming import stream_events, stream_to_parquet

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    src = stream_events(spark, sf_dir).filter(F.col("event_type") == "click")
    stream_to_parquet(src, out, ckpt)

    expected = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "click")
        .count()
    )
    back = spark.read.parquet(out)
    assert back.filter(F.col("event_id").isNotNull()).count() == expected

    # rerun: checkpoint says everything is processed → no duplicates
    src2 = stream_events(spark, sf_dir).filter(F.col("event_type") == "click")
    stream_to_parquet(src2, out, ckpt)
    assert spark.read.parquet(out).count() == expected


def test_foreach_batch_sink_across_multiple_batches(spark, sf_dir, tmp_path):
    """The per-batch dynamic-overwrite sink must also be correct when
    the stream actually runs MANY micro-batches: 4 source files at
    maxFilesPerTrigger=1 → ≥2 batches, each landing in its own
    _batch_id partition, union == input."""
    from pyspark.sql import functions as F

    from jobx_spark.sources import load_table
    from jobx_spark.streaming import stream_to_parquet

    ev = load_table(spark, sf_dir, "events")
    src_dir = str(tmp_path / "src")
    ev.repartition(4).write.parquet(src_dir)

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir)
    )
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    stream_to_parquet(stream, out, ckpt)

    back = spark.read.parquet(out)
    assert back.count() == ev.count()
    n_batches = back.select("_batch_id").distinct().count()
    assert n_batches >= 2
    assert (
        back.agg(F.count_distinct("event_id")).first()[0]
        == ev.select("event_id").distinct().count()
    )


def test_stream_upsert_keeps_latest_per_key(spark, sf_dir, tmp_path):
    """Streaming MERGE: the keyed parquet state converges to one row
    per user carrying that user's max event ts, and a replay (fresh
    checkpoint, same input) is absorbed without growing the table."""
    from pyspark.sql import functions as F

    from jobx_spark.sources import load_table
    from jobx_spark.streaming import stream_events, stream_upsert_parquet

    out = str(tmp_path / "state")
    src = stream_events(spark, sf_dir).select("user_id", "ts", "value")
    stream_upsert_parquet(
        src, out, str(tmp_path / "c1"), key_cols=["user_id"], version_col="ts"
    )

    ev = load_table(spark, sf_dir, "events")
    expected = (
        ev.groupBy("user_id").agg(F.max("ts").alias("ts"))
        .orderBy("user_id")
        .collect()
    )
    got = (
        spark.read.parquet(out)
        .select("user_id", "ts")
        .orderBy("user_id")
        .collect()
    )
    assert [(r.user_id, r.ts) for r in got] == [
        (r.user_id, r.ts) for r in expected
    ]

    # replay with a fresh checkpoint: merge semantics absorb it
    src2 = stream_events(spark, sf_dir).select("user_id", "ts", "value")
    stream_upsert_parquet(
        src2, out, str(tmp_path / "c2"), key_cols=["user_id"], version_col="ts"
    )
    assert spark.read.parquet(out).count() == len(expected)


def test_update_mode_rollup_converges_across_batches(spark, sf_dir, tmp_path):
    """The update-mode agg → MERGE rollup must converge to the batch
    answer when windows are UPDATED across several micro-batches (not
    just written once): 4 source files at maxFilesPerTrigger=1 → ≥2
    batches, later batches re-emitting grown windows; the monotone-count
    MERGE must keep exactly the final value per key."""
    from pyspark.sql import functions as F

    from jobx_spark.sources import load_table
    from jobx_spark.streaming import (
        stream_upsert_parquet,
        tumbling_window_agg,
    )

    ev = load_table(spark, sf_dir, "events")
    src_dir = str(tmp_path / "src")
    # split WITHOUT clustering by time so every batch touches most windows
    ev.repartition(4).write.parquet(src_dir)

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir)
    )
    state, ckpt = str(tmp_path / "state"), str(tmp_path / "ckpt")
    # replay over UNORDERED files: the watermark must span the data or
    # later batches' events are all "late" and silently dropped — the
    # exact failure this test exists to catch.
    stream_upsert_parquet(
        tumbling_window_agg(stream, watermark="3650 days"), state, ckpt,
        key_cols=["window_start", "event_type"], version_col="n",
        output_mode="update",
    )

    got = (
        spark.read.parquet(state)
        .select("window_start", "event_type", "n", "total_value")
        .orderBy("window_start", "event_type")
        .collect()
    )
    want = (
        ev.groupBy(
            F.date_trunc("hour", "ts").alias("window_start"), "event_type"
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(38,8)"))
            .cast("string")
            .cast("double")
            .alias("total_value"),
        )
        .orderBy("window_start", "event_type")
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
