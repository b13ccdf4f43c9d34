"""Size-gated, session-shared corpus-LM count table (VERDICT r5 #3):
below BSCORE_MAT_MIN_BYTES the (doc_id, bigram, c_db) table stays a
lazy plan (no parquet round-trip); at/above it one materialization
serves both text_bigram_score and text_perplexity_buckets; and the
switch never changes values."""

import pytest
from pyspark.sql import functions as F

from jobx_spark.queries import text as T


@pytest.fixture(autouse=True)
def _clean_cache():
    T._CDB_PATHS.clear()
    yield
    T._CDB_PATHS.clear()


def _docs(spark, sf_dir):
    from jobx_spark.sources import load_table

    return load_table(spark, sf_dir, "documents")


def test_small_source_skips_materialization(spark, sf_dir, monkeypatch):
    docs = _docs(spark, sf_dir)
    assert T._source_bytes(docs) < T.BSCORE_MAT_MIN_BYTES
    T._bigram_doc_scores(docs).collect()
    assert T._CDB_PATHS == {}  # below the crossover: no write, no cache


def test_large_source_materializes_once_and_shares(spark, sf_dir, monkeypatch):
    monkeypatch.setattr(T, "BSCORE_MAT_MIN_BYTES", 0)  # force "large"
    docs = _docs(spark, sf_dir)
    a = T._bigram_doc_scores(docs).collect()
    assert len(T._CDB_PATHS) == 1
    path = next(iter(T._CDB_PATHS.values()))
    b = T._bigram_doc_scores(docs).collect()
    assert T._CDB_PATHS == {next(iter(T._CDB_PATHS)): path}  # reused, not rebuilt
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_switch_is_value_invariant(spark, sf_dir, monkeypatch):
    docs = _docs(spark, sf_dir)
    lazy = sorted(map(tuple, T._bigram_doc_scores(docs).collect()))
    monkeypatch.setattr(T, "BSCORE_MAT_MIN_BYTES", 0)
    mat = sorted(map(tuple, T._bigram_doc_scores(docs).collect()))
    assert lazy == mat
