"""embedding_dup_pairs must never silently degrade to an all-pairs
cross product: block_col=None auto-blocks with hyperplane LSH, and the
explicit all-pairs escape hatch refuses large inputs."""

import pytest
from pyspark.sql import functions as F

from jobx_spark.operators import dedup
from jobx_spark.operators.similarity import hyperplane_bucket_udf


def _vectors(spark, n=40, dim=8):
    rows = [(i, [((i * 31 + j * 7) % 13 - 6) / 6.0 for j in range(dim)]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_none_block_auto_lsh_matches_explicit_bucket(spark):
    df = _vectors(spark)
    auto = dedup.embedding_dup_pairs(
        df, block_col=None, min_cosine=0.5, auto_block_planes=4
    )
    explicit = dedup.embedding_dup_pairs(
        df.withColumn("blk", hyperplane_bucket_udf(4)(F.col("embedding"))),
        block_col="blk",
        min_cosine=0.5,
    )
    assert sorted(map(tuple, auto.collect())) == sorted(map(tuple, explicit.collect()))


def test_all_pairs_requires_opt_in_and_row_limit(spark, monkeypatch):
    df = _vectors(spark, n=30)
    monkeypatch.setattr(dedup, "ALL_PAIRS_LIMIT", 10)
    with pytest.raises(ValueError, match="all_pairs"):
        dedup.embedding_dup_pairs(df, block_col=None, allow_all_pairs=True)
    monkeypatch.setattr(dedup, "ALL_PAIRS_LIMIT", 10_000)
    out = dedup.embedding_dup_pairs(
        df, block_col=None, allow_all_pairs=True, min_cosine=-2.0
    )
    assert out.count() == 30 * 29 // 2


def test_bloom_decontaminate_never_false_negative(spark):
    """dedup_bloom_decontaminate's load-bearing claim, executed: the
    Bloom prefilter may false-positive (fp_grams >= 0) but can NEVER
    miss a truly contaminated gram — every doc with exact hits must be
    bloom-flagged at least as often, and keep must be exactly
    (exact_hits == 0). A filter bug that dropped a contaminated doc
    would pass a hash gate built on a matching-but-wrong oracle; this
    pins the semantic invariant independently."""
    from jobx_spark.queries import all_queries

    rows = all_queries()["dedup_bloom_decontaminate"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    assert any(r["exact_hits"] > 0 for r in rows), (
        "fixture must contain at least one contaminated train doc"
    )
    for r in rows:
        assert r["bloom_hits"] >= r["exact_hits"], (
            f"doc {r['doc_id']}: bloom missed a true hit "
            f"({r['bloom_hits']} < {r['exact_hits']})"
        )
        assert r["fp_grams"] == r["bloom_hits"] - r["exact_hits"]
        assert r["keep"] == (r["exact_hits"] == 0)
