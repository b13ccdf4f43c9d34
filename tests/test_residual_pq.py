"""Residual-encoded IVF-PQ quality pin (VERDICT r6 #3).

Residual encoding is only worth shipping if it buys accuracy at the
same code budget: both PQ variants spend 4 codes × 8 cells per vector,
so recall@K against exact brute-force ground truth is the apples-to-
apples comparison. The claim FAISS makes for IVFADC (Jégou et al.
2011) — residual codebooks beat raw-vector codebooks because the
coarse quantizer has already removed cell-mean variance — is pinned
here as: summed recall@10 over the probe queries for
``ann_ivf_pq_residual_topk`` ≥ that of ``ann_ivf_pq_topk``.

Both variants share the coarse quantizer and nprobe, so the candidate
sets are identical — the comparison isolates exactly the ADC ranking
quality, which is the thing residual encoding changes.
"""

import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def topk_sets(spark):
    from jobx_spark.queries import all_queries

    qs = all_queries()
    out = {}
    for name in (
        "ann_bruteforce_topk", "ann_ivf_pq_topk", "ann_ivf_pq_residual_topk",
    ):
        rows = qs[name](spark, SF).collect()
        byq: dict[int, set[int]] = {}
        for r in rows:
            byq.setdefault(r["query_id"], set()).add(r["vec_id"])
        out[name] = byq
    return out


def _recall(byq_approx, byq_truth) -> int:
    """Total ground-truth hits across queries (integer — no float
    averaging ambiguity)."""
    return sum(
        len(byq_approx.get(q, set()) & truth)
        for q, truth in byq_truth.items()
    )


def test_residual_recall_at_least_raw_pq(topk_sets):
    truth = topk_sets["ann_bruteforce_topk"]
    raw = _recall(topk_sets["ann_ivf_pq_topk"], truth)
    res = _recall(topk_sets["ann_ivf_pq_residual_topk"], truth)
    assert res >= raw, (
        f"residual PQ recall {res} < raw-vector PQ recall {raw} "
        f"(same code size, same coarse quantizer/nprobe)"
    )


def test_residual_returns_full_topk_per_query(topk_sets):
    """Every probe query must rank a full k candidates (the IVF probe
    set at this SF is comfortably larger than k)."""
    byq = topk_sets["ann_ivf_pq_residual_topk"]
    assert sorted(byq) == [0, 1, 2, 3, 4]
    assert all(len(v) == 10 for v in byq.values())
