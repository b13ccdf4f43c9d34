#!/usr/bin/env python
"""Scale-up probe: replicate sf0.1 in memory (documents ×20 → 100k
docs, events ×10 → 1M rows) and time the heavy operators, checking
none goes superlinear in input size. Feeds SURVEY.md §8.4.

Replication remaps ids into disjoint ranges (doc_id + k·10^9), so the
corpus keeps its near-dup cluster structure — every original cluster
appears REP times — and pair-producers face the worst case: each
near-dup cluster becomes a clique REP× larger.

Usage: python tools/scale_probe.py [sf_dir] (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DOC_REP, EV_REP = 20, 10


def main() -> None:
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from jobx_spark.operators.dedup import (
        connected_components,
        exact_dedup,
        minhash_lsh_pairs,
        simhash,
    )
    from jobx_spark.session import get_spark
    from jobx_spark.sources import load_table

    spark = get_spark("scale_probe")
    docs0 = load_table(spark, SF_DIR, "documents")
    reps = spark.range(DOC_REP).select(F.col("id").alias("rep"))
    docs = (
        docs0.crossJoin(F.broadcast(reps))
        .withColumn("doc_id", F.col("doc_id") + F.col("rep") * F.lit(10**9))
        .drop("rep")
        .repartition(32)
        .persist()
    )
    n_docs = docs.count()

    ev0 = load_table(spark, SF_DIR, "events")
    ev_reps = spark.range(EV_REP).select(F.col("id").alias("rep"))
    events = (
        ev0.crossJoin(F.broadcast(ev_reps))
        .withColumn("event_id", F.col("event_id") + F.col("rep") * F.lit(10**9))
        .drop("rep")
        .repartition(32)
        .persist()
    )
    n_events = events.count()

    results: dict[str, float] = {}

    def probe(name: str, fn) -> None:
        t0 = time.monotonic()
        out = fn()
        results[name] = round(time.monotonic() - t0, 2)
        print(f"[{results[name]:8.2f}s] {name}: {out}", flush=True)

    probe("exact_dedup", lambda: exact_dedup(docs).count())
    probe("simhash", lambda: simhash(docs).count())
    probe(
        "minhash_lsh_pairs",
        lambda: minhash_lsh_pairs(docs, n_hashes=16, bands=4).count(),
    )
    probe(
        "connected_components",
        lambda: connected_components(
            minhash_lsh_pairs(docs, n_hashes=16, bands=4)
        ).count(),
    )
    from jobx_spark.operators.dedup import triangle_counts

    probe(
        "triangle_counts",
        lambda: triangle_counts(
            minhash_lsh_pairs(docs, n_hashes=16, bands=4)
        ).count(),
    )

    from jobx_spark.operators.dedup import containment_pairs

    probe(
        "containment_pairs",
        lambda: containment_pairs(
            docs, block_col="source", n=3, min_containment=0.8
        ).count(),
    )

    from jobx_spark.operators.similarity import brute_force_topk

    emb0 = load_table(spark, SF_DIR, "embeddings")
    emb = (
        emb0.crossJoin(F.broadcast(ev_reps))
        .withColumn("vec_id", F.col("vec_id") + F.col("rep") * F.lit(10**9))
        .drop("rep")
        .repartition(32)
        .persist()
    )
    n_emb = emb.count()
    queries = emb.filter(F.col("vec_id") % F.lit(997) == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    probe(
        "ann_bruteforce_topk",
        lambda: brute_force_topk(emb, queries, k=10).count(),
    )

    from jobx_spark.operators.similarity import knn_graph

    probe(
        "knn_graph",
        lambda: knn_graph(emb, k=5, n_planes=6).count(),
    )

    from jobx_spark.operators.dedup import label_propagation

    probe(
        "label_propagation",
        lambda: label_propagation(
            minhash_lsh_pairs(docs, n_hashes=16, bands=4)
        ).count(),
    )

    from jobx_spark.operators.dedup import incremental_dup_pairs

    probe(
        "incremental_dup_pairs",
        lambda: incremental_dup_pairs(
            docs.filter(F.col("doc_id") % 10 != 0),
            docs.filter(F.col("doc_id") % 10 == 0),
        ).count(),
    )

    from jobx_spark.operators.multimodal import (
        attach_binary_payload,
        frame_energy_features,
    )

    probe(
        "frame_energy_features",
        lambda: frame_energy_features(
            attach_binary_payload(docs, "doc_id", "text", kind="text/plain")
        ).count(),
    )

    from jobx_spark.operators.dedup import ngram_overlap_flags

    probe(
        "ngram_overlap_flags",
        lambda: ngram_overlap_flags(
            docs.filter(F.col("doc_id") % 10 != 0),
            docs.filter(F.col("doc_id") % 10 == 0),
            shingle_n=5,
            min_shared=3,
        ).count(),
    )

    from jobx_spark.operators.dedup import kcore

    probe(
        "kcore",
        lambda: kcore(
            minhash_lsh_pairs(docs, n_hashes=16, bands=4), k=2, rounds=3
        ).count(),
    )

    from jobx_spark.operators.sketches import (
        bloom_positions,
        bloom_probe,
        hll_registers,
    )
    from jobx_spark.operators.text import tokens

    probe(
        "hll_registers_tokens",
        lambda: hll_registers(
            docs.select(F.explode(tokens(F.col("text"))).alias("tok")), "tok"
        ).count(),
    )

    probe(
        "bloom_build_probe",
        lambda: bloom_probe(
            events.select("user_id"),
            "user_id",
            bloom_positions(
                docs.select((F.col("doc_id") % 1000).alias("k")), "k"
            ),
        ).count(),
    )

    from jobx_spark.operators.similarity import ivf_assign, kmeans_train

    def _pq_assign() -> int:
        total = 0
        for s in range(4):
            sub = emb.select(
                "vec_id", F.slice("embedding", s * 16 + 1, 16).alias("embedding")
            )
            cents = kmeans_train(
                emb0.select(
                    "vec_id", F.slice("embedding", s * 16 + 1, 16).alias("embedding")
                ),
                k=8, iters=3, cent_base=10, output="centroids",
            )
            total += ivf_assign(sub, cents).count()
        return total

    probe("pq_train_assign", _pq_assign)

    probe(
        "sessionize_events",
        lambda: events.select("user_id", "ts")
        .withColumn(
            "prev", F.lag("ts").over(W.partitionBy("user_id").orderBy("ts"))
        )
        .filter(
            F.col("prev").isNull()
            | (F.col("ts").cast("long") - F.col("prev").cast("long") > 1800)
        )
        .count(),
    )

    # ---- round-5 operators ----
    from jobx_spark.functions import md5_long
    from jobx_spark.operators.recurrence import ewma_dyadic_fold
    from jobx_spark.operators.text import shingles
    from jobx_spark.queries.text import winnow_selected

    probe("winnow_selected", lambda: winnow_selected(docs).count())

    def _source_overlap() -> int:
        st = (
            docs.select(
                "source", F.explode(shingles("text", 8)).alias("s")
            )
            .select("source", md5_long("s").alias("h"))
            .distinct()
            .persist()
        )
        a = st.select(F.col("source").alias("sa"), "h")
        b = st.select(F.col("source").alias("sb"), "h")
        n = (
            a.join(b, "h")
            .filter(F.col("sa") < F.col("sb"))
            .groupBy("sa", "sb")
            .count()
            .count()
        )
        st.unpersist()
        return n

    probe("source_overlap_census", _source_overlap)

    # 10× events: ~6.7k events/user > the 4096 chunk, so every key
    # takes the HOT two-pass transfer-function path — the skew machinery
    # under real volume, not just the synthetic wave test.
    probe(
        "ewma_fold_hot",
        lambda: ewma_dyadic_fold(
            events.select(
                "user_id",
                F.floor(F.col("value") * 10**6).cast("long").alias("x_s"),
                "ts",
                "event_id",
            ),
            key="user_id",
            value="x_s",
            order=["ts", "event_id"],
        ).count(),
    )

    print(
        json.dumps(
            {
                "n_docs": n_docs,
                "n_events": n_events,
                "n_embeddings": n_emb,
                "doc_rep": DOC_REP,
                "ev_rep": EV_REP,
                "timings_s": results,
            }
        )
    )


if __name__ == "__main__":
    main()
