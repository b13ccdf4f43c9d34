"""Chunked dyadic-EWMA fold (operators/recurrence.py): exactness of
the transfer-function decomposition, and the skew guard VERDICT r4 #7
asked for — one deliberately hot key whose history exceeds any single
pandas group by construction, hash-exact vs a driver-side reference
fold."""

import random

import pytest
from pyspark.sql import functions as F

from jobx_spark.operators.recurrence import (
    _apply_transfer,
    _chunk_transfer,
    ewma_dyadic_fold,
)


def _ref_fold(xs):
    acc = 0
    for x in xs:
        acc = (acc + int(x)) // 2
    return acc


def test_transfer_function_matches_direct_fold_all_lengths():
    """Closed form (a + S) >> L == sequential fold, across the int64
    encoding's L<=63 / L>=64 regimes and random states."""
    rng = random.Random(7)
    for length in (1, 2, 63, 64, 65, 200):
        xs = [rng.randrange(0, 10**9) for _ in range(length)]
        n, base, aux = _chunk_transfer(xs)
        assert n == length
        for a in (0, 1, 17, 10**9, 2**40):
            want = a
            for x in xs:
                want = (want + x) // 2
            assert _apply_transfer(a, n, base, aux) == want, (length, a)


def test_chunks_compose_exactly():
    rng = random.Random(11)
    xs = [rng.randrange(0, 10**9) for _ in range(1000)]
    acc = 0
    for i in range(0, len(xs), 96):  # uneven final chunk on purpose
        n, base, aux = _chunk_transfer(xs[i : i + 96])
        acc = _apply_transfer(acc, n, base, aux)
    assert acc == _ref_fold(xs)


@pytest.mark.usefixtures("spark")
def test_skewed_hot_key_bounded_groups(spark):
    """One key holds 50k of 51k events; chunk=256 so pass 1 sees ≤256
    rows per pandas group and pass 2 sees ~196 summary rows — the
    memory bound that makes a 10⁹-event key survivable. Result must be
    hash-exact vs the driver-side reference fold."""
    rng = random.Random(3)
    hot = [(1, i, rng.randrange(0, 10**6)) for i in range(50_000)]
    cold = [(2 + (i % 50), 10**6 + i, rng.randrange(0, 10**6)) for i in range(1_000)]
    df = spark.createDataFrame(hot + cold, "user_id long, event_id long, x long")
    out = ewma_dyadic_fold(
        df.withColumn("ts", F.col("event_id")),
        key="user_id",
        value="x",
        order=["ts", "event_id"],
        chunk=256,
    )
    got = {r["user_id"]: (r["n_events"], r["ewma_s"]) for r in out.collect()}

    expect = {}
    for uid, eid, x in sorted(hot + cold, key=lambda t: (t[0], t[1])):
        expect.setdefault(uid, []).append(x)
    for uid, xs in expect.items():
        assert got[uid] == (len(xs), _ref_fold(xs)), uid
    assert got[1][0] == 50_000


@pytest.mark.usefixtures("spark")
def test_query_matches_unchunked_semantics(spark, sf_dir):
    """pipe_ewma_user_value through the chunked operator equals the
    naive whole-group fold on real testdata."""
    import pandas as pd

    from jobx_spark.queries.pipeline import EWMA_SCALE, pipe_ewma_user_value

    got = {
        r["user_id"]: (r["n_events"], r["ewma_s"])
        for r in pipe_ewma_user_value(spark, sf_dir).collect()
    }

    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select(
            "user_id",
            F.floor(F.col("value") * EWMA_SCALE).cast("long").alias("x_s"),
            "ts",
            "event_id",
        )
        .toPandas()
        .sort_values(["user_id", "ts", "event_id"])
    )
    for uid, grp in ev.groupby("user_id"):
        xs = grp["x_s"].tolist()
        assert got[int(uid)] == (len(xs), _ref_fold(xs)), uid


@pytest.mark.usefixtures("spark")
def test_string_key_schema_derivation(spark):
    """ADVICE r5: the applyInPandas schemas derive the key type from
    the input, so non-integral keys (string here) fold without an
    Arrow cast error — both the cold path and the chunked hot path."""
    rng = random.Random(5)
    rows = [("hot", i, rng.randrange(0, 10**6)) for i in range(600)]
    rows += [("cold", 10**6 + i, rng.randrange(0, 10**6)) for i in range(40)]
    df = spark.createDataFrame(rows, "name string, event_id long, x long")
    out = ewma_dyadic_fold(
        df, key="name", value="x", order=["event_id"], chunk=256
    )
    got = {r["name"]: (r["n_events"], r["ewma_s"]) for r in out.collect()}
    by_key = {}
    for name, eid, x in sorted(rows, key=lambda t: (t[0], t[1])):
        by_key.setdefault(name, []).append(x)
    assert got == {
        k: (len(xs), _ref_fold(xs)) for k, xs in by_key.items()
    }
