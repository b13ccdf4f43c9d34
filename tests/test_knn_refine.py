"""NN-descent refinement quality pin (VERDICT r7 #5).

One neighbor-of-neighbor round (Dong, Moses & Li 2011) only earns its
place if it recovers truth the LSH-blocked construction missed: the
candidate set strictly contains the raw graph's edges and every
candidate is rescored EXACTLY, so per-query recall against brute-force
truth can never drop — keep-top-k over a superset, same exact score,
same tiebreak. That monotonicity is pinned here as an executed
property at both smoke scales, not a docstring claim.
"""

import pytest

SFS = ("/root/testdata/sf0.001", "/root/testdata/sf0.01")


@pytest.mark.parametrize("sf", SFS)
def test_refined_recall_never_below_graph_recall(spark, sf):
    from jobx_spark.queries import all_queries

    rows = all_queries()["ann_knn_refine"](spark, sf).collect()
    assert rows, "eval must cover the probe set"
    for r in rows:
        assert r["refined_hits"] >= r["graph_hits"], (
            f"query {r['query_id']}: refine dropped recall "
            f"{r['graph_hits']} -> {r['refined_hits']}"
        )
        assert 0 <= r["refined_hits"] <= r["k"]


def test_quantile_sketch_merged_equals_direct(spark):
    """pipe_quantile_sketch's mergeability certificate (VERDICT r7 #6):
    the __merged__ row (per-source bin tables summed) must equal the
    __direct__ row (corpus sketch from scratch) on every column — the
    text_hll_merge twin-row device, asserted in CI as well as under
    the driver's hash gate."""
    from jobx_spark.queries import all_queries

    rows = {
        r["source"]: r
        for r in all_queries()["pipe_quantile_sketch"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    m, d = rows["__merged__"], rows["__direct__"]
    for col in ("n_docs", "p50_est", "p90_est", "p99_est",
                "p50_exact", "p90_exact", "p99_exact"):
        assert m[col] == d[col], f"{col}: merged {m[col]} != direct {d[col]}"
    # the sketch's error contract: estimate is the bin's upper edge, so
    # it sits within one bin width above the exact value
    from jobx_spark.queries.pipeline import QSK_BINW

    for src, r in rows.items():
        for tag in ("p50", "p90", "p99"):
            est, exact = r[f"{tag}_est"], r[f"{tag}_exact"]
            assert exact < est <= exact + QSK_BINW, (
                f"{src} {tag}: est {est} outside ({exact}, {exact + QSK_BINW}]"
            )
