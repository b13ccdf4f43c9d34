"""Similarity-search queries over `embeddings`: exact brute-force top-k
and the LSH-bucketed approximate variant, both with DuckDB oracles built
from the same deterministic arithmetic."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jobx_spark.operators.similarity import (
    _WMOD,
    _WP1,
    _WP2,
    brute_force_topk,
    lsh_topk,
)
from jobx_spark.sources import load_table

K = 10
N_QUERIES = 5  # probe set: vec_id 0..4
N_PLANES = 6

_SDOT = (
    "CAST(list_sum(list_transform(list_zip({a}, {b}),"
    " x -> CAST(floor(x[1]::DOUBLE * x[2]::DOUBLE * 1e12) AS BIGINT))) AS BIGINT)"
)


def _probe_queries(emb: DataFrame) -> DataFrame:
    return emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )


# --------------------------------------------------------------------------
# ann_bruteforce_topk — exact cosine top-k for the probe set.
# --------------------------------------------------------------------------
def ann_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return brute_force_topk(emb, _probe_queries(emb), k=K).orderBy("query_id", "rank")


ORACLE_ANN_BRUTEFORCE = f"""
WITH e AS (
  SELECT vec_id, embedding, {_SDOT.format(a='embedding', b='embedding')} AS norm_s
  FROM embeddings
), q AS (
  SELECT vec_id AS query_id, embedding AS qv, norm_s AS qnorm_s
  FROM e WHERE vec_id < {N_QUERIES}
), scored AS (
  SELECT q.query_id, e.vec_id,
         {_SDOT.format(a='q.qv', b='e.embedding')}::DOUBLE
           / (sqrt(q.qnorm_s::DOUBLE) * sqrt(e.norm_s::DOUBLE)) AS cosine
  FROM e, q
), ranked AS (
  SELECT query_id, vec_id, cosine,
         CAST(row_number() OVER (PARTITION BY query_id
              ORDER BY cosine DESC, vec_id ASC) AS INTEGER) AS rank
  FROM scored
)
SELECT query_id, vec_id, rank, cosine
FROM ranked WHERE rank <= {K}
ORDER BY query_id, rank
"""


# --------------------------------------------------------------------------
# ann_lsh_topk — hyperplane-bucketed approximate top-k.
# --------------------------------------------------------------------------
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return lsh_topk(emb, _probe_queries(emb), k=K, n_planes=N_PLANES).orderBy(
        "query_id", "rank"
    )


def _lsh_oracle() -> str:
    # bucket bit j: sign of sum_i floor(e[i] * w(j, i-1) * 1e12), w = ±1
    # from ((j*WP1 + (i-1)*WP2) % WMOD) parity; DuckDB lists are 1-based,
    # Spark's index sequence is 0-based — hence (i-1).
    bits = " + ".join(
        f"""(CASE WHEN CAST(list_sum(list_transform(generate_series(1, len(embedding)),
            i -> CAST(floor(embedding[i]::DOUBLE *
                 (CASE WHEN (({j} * {_WP1} + (i - 1) * {_WP2}) % {_WMOD}) % 2 = 0
                       THEN 1.0 ELSE -1.0 END) * 1e12) AS BIGINT))) AS BIGINT) >= 0
            THEN {1 << j}::BIGINT ELSE 0::BIGINT END)"""
        for j in range(N_PLANES)
    )
    return f"""
WITH e AS (
  SELECT vec_id, embedding,
         {_SDOT.format(a='embedding', b='embedding')} AS norm_s,
         CAST({bits} AS BIGINT) AS bucket
  FROM embeddings
), q AS (
  SELECT vec_id AS query_id, embedding AS qv, norm_s AS qnorm_s, bucket
  FROM e WHERE vec_id < {N_QUERIES}
), scored AS (
  SELECT q.query_id, e.vec_id,
         {_SDOT.format(a='q.qv', b='e.embedding')}::DOUBLE
           / (sqrt(q.qnorm_s::DOUBLE) * sqrt(e.norm_s::DOUBLE)) AS cosine
  FROM e JOIN q ON e.bucket = q.bucket
), ranked AS (
  SELECT query_id, vec_id, cosine,
         CAST(row_number() OVER (PARTITION BY query_id
              ORDER BY cosine DESC, vec_id ASC) AS INTEGER) AS rank
  FROM scored
)
SELECT query_id, vec_id, rank, cosine
FROM ranked WHERE rank <= {K}
ORDER BY query_id, rank
"""


QUERIES = {
    "ann_bruteforce_topk": ann_bruteforce_topk,
    "ann_lsh_topk": ann_lsh_topk,
}

ORACLES = {
    "ann_bruteforce_topk": ORACLE_ANN_BRUTEFORCE,
    "ann_lsh_topk": _lsh_oracle(),
}
