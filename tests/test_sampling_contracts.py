"""Size/determinism contracts of the hash-based samplers, beyond the
value-level oracle match: exact output sizes (including strata smaller
than K) and run-to-run stability inside one session."""

from pyspark.sql import functions as F

from jobx_spark.queries.pipeline import (
    FIXED_K,
    STRAT_K,
    pipe_sample_fixed_k,
    pipe_stratified_k,
)
from jobx_spark.sources import load_table


def test_fixed_k_returns_exactly_min_k_n(spark, sf_dir):
    n = load_table(spark, sf_dir, "documents").count()
    out = pipe_sample_fixed_k(spark, sf_dir)
    assert out.count() == min(FIXED_K, n)


def test_fixed_k_is_stable_across_reruns(spark, sf_dir):
    a = {r["doc_id"] for r in pipe_sample_fixed_k(spark, sf_dir).collect()}
    b = {r["doc_id"] for r in pipe_sample_fixed_k(spark, sf_dir).collect()}
    assert a == b


def test_stratified_k_caps_each_stratum(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    sizes = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    got = {
        r["lang"]: r["n"]
        for r in pipe_stratified_k(spark, sf_dir)
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert set(got) == set(sizes)
    for lang, n in sizes.items():
        assert got[lang] == min(STRAT_K, n), lang


def test_fixed_k_sample_is_subset_of_corpus(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = pipe_sample_fixed_k(spark, sf_dir)
    assert out.join(docs, "doc_id", "left_anti").count() == 0
