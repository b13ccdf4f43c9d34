"""Behavioral contracts for the session-2 graph/dedup/similarity
operators — properties the cross-engine oracle equality can't express:
label propagation's density separation, kNN-graph shape invariants,
n-gram overlap thresholding, and incremental dedup's equivalence to the
crossing slice of full-corpus LSH."""

import pytest
from pyspark.sql import functions as F

from jobx_spark.operators.dedup import (
    connected_components,
    incremental_dup_pairs,
    label_propagation,
    minhash_lsh_pairs,
    ngram_overlap_flags,
)
from jobx_spark.operators.similarity import knn_graph
from jobx_spark.sources import load_table


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "id_a long, id_b long")


def test_label_prop_separates_bridged_cliques(spark):
    """Two 4-cliques joined by ONE bridge edge: min-label components
    merges them (connectivity), neighbor-majority voting keeps them
    apart (density) — the reason to have both operators."""
    clique_a = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    clique_b = [(10, 11), (10, 12), (10, 13), (11, 12), (11, 13), (12, 13)]
    bridge = [(4, 10)]
    e = _edges(spark, clique_a + clique_b + bridge)

    comp = {r["node"]: r["comp"] for r in connected_components(e).collect()}
    assert len(set(comp.values())) == 1  # one connected component

    lp = {r["node"]: r["community"] for r in label_propagation(e).collect()}
    a_labels = {lp[n] for n in (1, 2, 3, 4)}
    b_labels = {lp[n] for n in (10, 11, 12, 13)}
    assert len(a_labels) == 1 and len(b_labels) == 1
    assert a_labels != b_labels  # the bridge did NOT merge the cliques


def test_label_prop_deterministic(spark):
    e = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5), (1, 5), (2, 4)])
    r1 = sorted(map(tuple, label_propagation(e).collect()))
    r2 = sorted(map(tuple, label_propagation(e).collect()))
    assert r1 == r2


def test_knn_graph_shape_invariants(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    g = knn_graph(emb, k=5, n_planes=6).cache()
    rows = g.collect()
    assert rows, "kNN graph produced no edges"
    # no self-loops, ranks within bound and dense per source
    assert all(r["src_id"] != r["nbr_id"] for r in rows)
    per_src = {}
    for r in rows:
        per_src.setdefault(r["src_id"], []).append(r["rank"])
    for src, ranks in per_src.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), src
        assert max(ranks) <= 5
    # cosine must be within [-1, 1] (scaled-integer arithmetic sanity)
    assert g.filter((F.col("cosine") > 1.000001) | (F.col("cosine") < -1.000001)).count() == 0
    g.unpersist()


def test_ngram_overlap_threshold_boundary(spark):
    """Flag requires >= min_shared DISTINCT shared n-grams: a doc
    sharing exactly 3 of the eval doc's 5-grams is flagged, a doc
    sharing 2 is not."""
    eval_df = spark.createDataFrame(
        [(100, "a b c d e f g")], "doc_id long, text string"
    )
    train = spark.createDataFrame(
        [
            (1, "a b c d e f g"),   # identical → 3 shared 5-grams
            (2, "a b c d e f x"),   # 2 shared ("a b c d e", "b c d e f")
            (3, "p q r s t u v"),   # 0 shared
        ],
        "doc_id long, text string",
    )
    flagged = {
        r["id"]: r["n_shared"]
        for r in ngram_overlap_flags(
            train, eval_df, shingle_n=5, min_shared=3
        ).collect()
    }
    assert flagged == {1: 3}


def test_incremental_equals_crossing_slice_of_full_lsh(spark, sf_dir):
    """Probing the new batch against the corpus index must find exactly
    the full-corpus LSH pairs that cross the split — no more, no less
    (same band constants ⇒ same candidates)."""
    docs = load_table(spark, sf_dir, "documents")
    split = 400
    corpus = docs.filter(F.col("doc_id") < split)
    batch = docs.filter(F.col("doc_id") >= split)
    incr = {
        (r["old_id"], r["new_id"]): r["n_shared_bands"]
        for r in incremental_dup_pairs(corpus, batch).collect()
    }
    full = minhash_lsh_pairs(docs).collect()
    crossing = {
        (r["id_a"], r["id_b"]): r["n_shared_bands"]
        for r in full
        if (r["id_a"] >= split) != (r["id_b"] >= split)
    }
    # full pairs are (min, max); incremental keys are (old, new) with
    # old < split <= new, so the tuples line up directly
    assert incr == crossing


def test_partitioning_invariance(spark, sf_dir):
    """Cluster-shape independence: the same operator over the same data
    must produce identical results under different input partitionings
    — the property that makes results reproducible across cluster
    sizes, AQE decisions, and retries."""
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")

    lp3 = sorted(
        map(tuple, label_propagation(minhash_lsh_pairs(docs.repartition(3))).collect())
    )
    lp17 = sorted(
        map(tuple, label_propagation(minhash_lsh_pairs(docs.repartition(17))).collect())
    )
    assert lp3 == lp17

    g3 = sorted(map(tuple, knn_graph(emb.repartition(3), k=5, n_planes=6).collect()))
    g17 = sorted(map(tuple, knn_graph(emb.repartition(17), k=5, n_planes=6).collect()))
    assert g3 == g17


def test_incremental_probe_from_persisted_index(spark, sf_dir, tmp_path):
    """The at-scale contract of incremental dedup: the corpus's banded
    signatures can be computed ONCE, persisted as the index, and probed
    by later batches — identical pairs to the on-the-fly operator, with
    no corpus re-signature at probe time."""
    from jobx_spark.operators.dedup import banded_signature

    docs = load_table(spark, sf_dir, "documents")
    split = 400
    corpus = docs.filter(F.col("doc_id") < split)
    batch = docs.filter(F.col("doc_id") >= split)

    idx_path = str(tmp_path / "band_index")
    banded_signature(corpus).withColumnRenamed("id", "old_id").write.parquet(
        idx_path
    )
    index = spark.read.parquet(idx_path)
    bb = banded_signature(batch).withColumnRenamed("id", "new_id")
    probed = {
        (r["new_id"], r["old_id"]): r["n_shared_bands"]
        for r in index.join(F.broadcast(bb), ["band", "bh"])
        .groupBy("new_id", "old_id")
        .agg(F.count(F.lit(1)).alias("n_shared_bands"))
        .collect()
    }
    direct = {
        (r["new_id"], r["old_id"]): r["n_shared_bands"]
        for r in incremental_dup_pairs(corpus, batch).collect()
    }
    assert probed == direct


def test_kcore_peels_pendant_chain(spark):
    """4-clique with a pendant 2-chain: the 2-core keeps exactly the
    clique (induced degree 3 everywhere) and peels the chain — the
    second round must re-peel node 5, whose degree only drops below 2
    AFTER node 6 is removed (i.e. the test fails on a single-pass
    degree filter)."""
    from jobx_spark.operators.dedup import kcore

    edges = _edges(
        spark,
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5), (5, 6)],
    )
    got = {(r.node, r.core_deg) for r in kcore(edges, k=2, rounds=3).collect()}
    assert got == {(1, 3), (2, 3), (3, 3), (4, 3)}


def test_kcore_of_clique_is_identity(spark):
    from jobx_spark.operators.dedup import kcore

    clique = [(a, b) for a in range(1, 6) for b in range(a + 1, 6)]
    got = {(r.node, r.core_deg) for r in kcore(_edges(spark, clique), k=4).collect()}
    assert got == {(n, 4) for n in range(1, 6)}


def test_lsss_agrees_with_label_prop_on_long_chain(spark):
    """A 40-node path is the adversarial case for min-label propagation
    (O(diameter) rounds); large-star/small-star collapses it in
    O(log n). Both must produce identical (node, min-of-component)
    labels — algorithm choice is pure performance."""
    from jobx_spark.operators.dedup import (
        connected_components,
        connected_components_lsss,
    )

    chain = [(i, i + 1) for i in range(1, 40)]
    extra = [(100, 101), (101, 102), (100, 102)]  # separate triangle
    e = _edges(spark, chain + extra)
    lp = {(r.node, r.comp) for r in connected_components(e, max_iter=50).collect()}
    ls = {(r.node, r.comp) for r in connected_components_lsss(e).collect()}
    assert lp == ls
    assert ls == {(n, 1) for n in range(1, 41)} | {(n, 100) for n in (100, 101, 102)}


def test_lsss_single_edge(spark):
    from jobx_spark.operators.dedup import connected_components_lsss

    got = {(r.node, r.comp)
           for r in connected_components_lsss(_edges(spark, [(7, 3)])).collect()}
    assert got == {(3, 3), (7, 3)}


def test_lsss_raises_on_max_iter_exhaustion(spark):
    """ADVICE r4: exiting via max_iter before the star-forest fixpoint
    must raise, never silently emit duplicate (node, comp) rows."""
    import pytest

    from jobx_spark.operators.dedup import connected_components_lsss

    chain = [(i, i + 1) for i in range(1, 20)]
    with pytest.raises(RuntimeError, match="no star-forest fixpoint"):
        connected_components_lsss(_edges(spark, chain), max_iter=0).collect()
