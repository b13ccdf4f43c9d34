"""Winnowing (MOSS) property tests: the detection guarantee and the
df-cap's boilerplate protection — the two claims the queries rely on
(Schleimer et al. 2003, Thm: any shared run of ≥ k+w−1 tokens shares
at least one selected fingerprint)."""

from pyspark.sql import functions as F

from jobx_spark.queries.text import WIN_K, WIN_W, winnow_selected


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_shared_run_guarantees_shared_fingerprint(spark):
    """Docs sharing a run of exactly k+w−1 tokens must share ≥1
    selected fingerprint hash, wherever the run sits in either doc."""
    run = "zq zw ze zr zt zy zu"  # k+w-1 = 7 tokens, unique shingles
    assert len(run.split()) == WIN_K + WIN_W - 1
    texts = [
        f"alpha beta gamma delta {run} epsilon zeta eta theta",
        f"one two three four five six seven eight nine ten {run}",
        "completely different words with no overlap at all here now",
    ]
    sel = winnow_selected(_docs(spark, texts))
    by_doc = {
        r["doc_id"]: set()
        for r in sel.select("doc_id").distinct().collect()
    }
    for r in sel.collect():
        by_doc[r["doc_id"]].add(r["sel_h"])
    assert by_doc[0] & by_doc[1], "shared 7-token run must share a fingerprint"
    assert not (by_doc[0] & by_doc[2])
    assert not (by_doc[1] & by_doc[2])


def test_density_bound(spark):
    """Selected set is far smaller than the window count but covers
    every window: for n grams there are n−w+1 windows and each selected
    position serves ≤ w windows, so selections ≥ (n−w+1)/w; and
    selections ≤ n−w+1 trivially. (Expected density is 2/(w+1).)"""
    words = " ".join(f"w{i * 7 % 101}x{i}" for i in range(200))
    sel = winnow_selected(_docs(spark, [words]))
    n_grams = 200 - WIN_K + 1
    n_windows = n_grams - WIN_W + 1
    n_sel = sel.count()
    assert n_windows / WIN_W <= n_sel <= n_windows


def test_df_cap_bounds_boilerplate_fanout(spark):
    """The MOSS common-fingerprint drop: with a boilerplate run shared
    by 60 > WINPAIR_MAXDF docs, any fingerprint selected in ALL of
    them is removed before pairing, and every surviving fingerprint
    joins ≤ WINPAIR_MAXDF docs — the per-hash fan-out bound that keeps
    a corpus-wide template from going quadratic. (Winnowing selection
    is context-dependent, so SOME boilerplate hashes legitimately land
    under the cap in a subset of docs — the guarantee is the bound,
    not zero pairs.)"""
    from jobx_spark.queries.dedup import WINPAIR_MAXDF

    boiler = "qa qb qc qd qe qf qg qh qi qj"
    texts = [f"unique{i} token{i} filler{i} {boiler} tail{i}" for i in range(60)]
    assert len(texts) > WINPAIR_MAXDF

    sel = winnow_selected(_docs(spark, texts))
    fps = sel.select("doc_id", "sel_h").distinct()
    dfs = fps.groupBy("sel_h").agg(F.count("*").alias("df"))
    # the shared run is long enough that at least one pure-boilerplate
    # fingerprint is selected corpus-wide — i.e. the cap has real work
    assert dfs.agg(F.max("df")).collect()[0][0] > WINPAIR_MAXDF
    rare = fps.join(
        dfs.filter(F.col("df") <= WINPAIR_MAXDF).select("sel_h"), "sel_h"
    )
    surviving_max_df = (
        rare.groupBy("sel_h").agg(F.count("*").alias("df"))
        .agg(F.max("df")).collect()[0][0]
    )
    assert surviving_max_df <= WINPAIR_MAXDF
