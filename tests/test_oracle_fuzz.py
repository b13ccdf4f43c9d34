"""Oracle-semantics fuzzing (hypothesis × DuckDB, no Spark).

The driver gate proves Spark == oracle on the fixed testdata; these
tests fuzz the ORACLES themselves over randomized tiny tables —
adversarial inputs the parquet fixtures never produce (tied caps,
zero-norm vectors, stopword-only documents, single-length corpora) —
and check the algorithmic invariants each operator's docstring claims.
The oracle is the semantic contract both engines must match, so a
property that holds under fuzz here is pinned for the Spark side by
the hash gate. DuckDB-only keeps each example in the millisecond
range.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

FUZZ = settings(
    max_examples=25,
    deadline=None,
    # large_base_example: the dim-sweep oracle hardcodes the 64-dim
    # embedding contract, so its minimal example is legitimately large
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.large_base_example],
)


def _con_with_documents(rows: list[tuple[int, str, str, str]]):
    con = duckdb.connect()
    df = pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source"]
    ).assign(n_chars=lambda d: d["text"].str.len())
    con.register("documents", df)
    return con


def _con_with_embeddings(vecs: list[list[float]]):
    con = duckdb.connect()
    df = pd.DataFrame(
        {
            "vec_id": range(len(vecs)),
            "embedding": [list(map(float, v)) for v in vecs],
            "label": [i % 3 for i in range(len(vecs))],
        }
    )
    con.register("embeddings", df)
    return con


# -- pipe_unimax_mixing ------------------------------------------------------
@FUZZ
@given(
    st.lists(
        st.integers(min_value=1, max_value=400), min_size=2, max_size=15
    )
)
def test_unimax_oracle_water_fill_invariants(src_tokens):
    from jobx_spark.queries.pipeline import (
        UNIMAX_B_DEN,
        UNIMAX_B_NUM,
        UNIMAX_EPOCHS,
        _unimax_oracle,
    )

    rows = [
        (i, "w " * k, "en", f"s{i:03d}") for i, k in enumerate(src_tokens)
    ]
    con = _con_with_documents(rows)
    out = con.execute(_unimax_oracle()).df()
    total = int(sum(src_tokens))
    budget = total * UNIMAX_B_NUM // UNIMAX_B_DEN
    caps = {f"s{i:03d}": k * UNIMAX_EPOCHS for i, k in enumerate(src_tokens)}
    assert len(out) == len(src_tokens)
    # feasibility + exact budget accounting
    assert (out["alloc_tokens"] <= out["cap_tokens"]).all()
    leftovers = set(out["leftover_tokens"])
    assert len(leftovers) == 1
    assert int(out["alloc_tokens"].sum()) + leftovers.pop() == budget
    for _, r in out.iterrows():
        assert caps[r["source"]] == r["cap_tokens"]
        if r["saturated"]:
            assert r["alloc_tokens"] == r["cap_tokens"]
    # unsaturated sources share one level; saturated caps never exceed it
    uns = out[~out["saturated"]]
    if len(uns):
        levels = set(uns["alloc_tokens"])
        assert len(levels) == 1
        lvl = levels.pop()
        sat = out[out["saturated"]]
        if len(sat):
            assert (sat["cap_tokens"] <= lvl).all()
    # saturation is a prefix of the cap order
    flags = list(out.sort_values("rank_by_cap")["saturated"])
    assert flags == sorted(flags, reverse=True)


# -- pipe_curriculum_order ---------------------------------------------------
@FUZZ
@given(
    st.lists(
        st.integers(min_value=1, max_value=60), min_size=1, max_size=40
    )
)
def test_curriculum_oracle_exact_quartiles_partition(doc_lens):
    from jobx_spark.queries.pipeline import ORACLE_PIPE_CURRICULUM

    rows = [
        (i, "w " * k, "en", f"s{i % 3}") for i, k in enumerate(doc_lens)
    ]
    con = _con_with_documents(rows)
    out = con.execute(ORACLE_PIPE_CURRICULUM).df()
    assert int(out["n_docs"].sum()) == len(doc_lens)
    # thresholds are the exact ceil-rank order statistics
    import math

    srt = sorted(doc_lens)
    n = len(srt)
    want = {
        "t25": srt[math.ceil(0.25 * n) - 1],
        "t50": srt[math.ceil(0.5 * n) - 1],
        "t75": srt[math.ceil(0.75 * n) - 1],
    }
    for k, v in want.items():
        assert set(out[k]) == {v}, f"{k}: {set(out[k])} != {v}"
    # phase ranges respect the thresholds (docs == threshold stay low)
    bounds = {
        1: (None, want["t25"]),
        2: (want["t25"], want["t50"]),
        3: (want["t50"], want["t75"]),
        4: (want["t75"], None),
    }
    for _, r in out.iterrows():
        lo, hi = bounds[r["phase"]]
        if lo is not None:
            assert r["min_toks"] > lo
        if hi is not None:
            assert r["max_toks"] <= hi


# -- text_rake_keywords ------------------------------------------------------
_RAKE_VOCAB = ["scan", "join", "merge", "the", "a", "de", "und", "row"]


@FUZZ
@given(
    st.lists(
        st.lists(st.sampled_from(_RAKE_VOCAB), min_size=1, max_size=30),
        min_size=1,
        max_size=12,
    )
)
def test_rake_oracle_phrases_are_real_stopword_bounded_runs(docs_tokens):
    from jobx_spark.queries.text import (
        RAKE_K,
        RAKE_MAX_WORDS,
        _rake_oracle,
        _rake_stopwords,
    )

    stop = set(_rake_stopwords())
    rows = [
        (i, " ".join(toks), "en", "s0")
        for i, toks in enumerate(docs_tokens)
    ]
    con = _con_with_documents(rows)
    out = con.execute(_rake_oracle()).df()
    # recompute the candidate runs in plain python
    runs: dict[str, int] = {}
    for toks in docs_tokens:
        cur: list[str] = []
        for t in toks + ["the"]:  # sentinel delimiter flushes the tail
            if t in stop:
                if cur and len(cur) <= RAKE_MAX_WORDS:
                    runs[" ".join(cur)] = runs.get(" ".join(cur), 0) + 1
                cur = []
            else:
                cur.append(t)
    assert len(out) <= RAKE_K
    assert len(out) == min(RAKE_K, len(runs))
    for _, r in out.iterrows():
        words = r["phrase"].split(" ")
        assert not (set(words) & stop), r["phrase"]
        assert 1 <= r["n_words"] == len(words) <= RAKE_MAX_WORDS
        assert r["phrase"] in runs, f"phantom phrase {r['phrase']!r}"
        assert r["n_occurrences"] == runs[r["phrase"]]
        assert r["score_ppm"] > 0
    # rank = (score desc, phrase asc) ordering
    ordered = sorted(
        out.itertuples(), key=lambda r: (-r.score_ppm, r.phrase)
    )
    assert [r.rank for r in ordered] == list(range(1, len(out) + 1))


# -- ann_dim_truncation_sweep ------------------------------------------------
@FUZZ
@given(
    st.lists(
        st.lists(
            st.floats(
                min_value=-1.0,
                max_value=1.0,
                allow_nan=False,
                width=32,
            ),
            min_size=64,
            max_size=64,
        ),
        min_size=6,
        max_size=14,
    ),
    st.booleans(),
)
def test_dim_sweep_oracle_control_row_and_hit_identity(vecs, add_zero):
    from jobx_spark.queries.similarity import (
        K,
        N_QUERIES,
        TRUNC_DIMS,
        _dim_sweep_oracle,
    )

    if add_zero:  # a zero-norm probe exercises the mask path
        vecs = [[0.0] * 64] + vecs[1:]
    con = _con_with_embeddings(vecs)
    out = con.execute(_dim_sweep_oracle()).df()
    nq = min(N_QUERIES, len(vecs))
    assert len(out) == len(TRUNC_DIMS) * nq
    dmax = max(TRUNC_DIMS)

    def norm_at(v, d):
        a = np.asarray(v[:d], dtype=np.float64)
        return int(np.floor(a * a * 1e12).astype(np.int64).sum())

    for _, r in out.iterrows():
        assert 0 <= r["n_hits"] <= K
        assert r["recall_permille"] == r["n_hits"] * 1000 // K
        if r["trunc_dim"] == dmax and norm_at(vecs[r["query_id"]], dmax) > 0:
            # self-join truth: the control row must be perfect recall
            n_corpus = sum(1 for v in vecs if norm_at(v, dmax) > 0)
            assert r["n_hits"] == min(K, n_corpus)
        if norm_at(vecs[r["query_id"]], r["trunc_dim"]) <= 0:
            assert r["n_hits"] == 0  # masked query retrieves nothing


# -- ann_mmr_diversify -------------------------------------------------------
@FUZZ
@given(
    st.lists(
        st.lists(
            st.floats(
                min_value=-1.0,
                max_value=1.0,
                allow_nan=False,
                width=32,
            ),
            min_size=8,
            max_size=8,
        ),
        min_size=6,
        max_size=30,
    )
)
def test_mmr_oracle_greedy_matches_independent_numpy_argmax(vecs):
    from jobx_spark.queries.similarity import (
        MMR_LAM10,
        MMR_M,
        MMR_POOL,
        N_QUERIES,
        _mmr_oracle,
    )

    con = _con_with_embeddings(vecs)
    out = con.execute(_mmr_oracle()).df()
    mat = np.asarray(vecs, dtype=np.float64)
    norms = np.floor(mat * mat * 1e12).astype(np.int64).sum(axis=1)

    def cos(i, j):
        dot = np.floor(mat[i] * mat[j] * 1e12).astype(np.int64).sum()
        return float(dot) / (
            np.sqrt(float(norms[i])) * np.sqrt(float(norms[j]))
        )

    for qid in range(min(N_QUERIES, len(vecs))):
        got = out[out["query_id"] == qid].sort_values("pick_order")
        if norms[qid] <= 0:
            assert len(got) == 0
            continue
        # ADVICE r9: mirror the oracle's pool exactly — rank the
        # top-(MMR_POOL+1) over ALL nonzero-norm candidates INCLUDING
        # the query itself, then drop the query. Excluding qid before
        # the cut kept a 21st candidate whenever qid ranked inside the
        # top-(MMR_POOL+1), a spurious-extra the greedy could pick.
        cands = [i for i in range(len(vecs)) if norms[i] > 0]
        pool = sorted(cands, key=lambda i: (-cos(qid, i), i))[: MMR_POOL + 1]
        pool = [i for i in pool if i != qid]
        rel = {i: int(np.trunc(cos(qid, i) * 1e6)) for i in pool}
        chosen: list[int] = []
        for r in got.itertuples():
            rest = [i for i in pool if i not in chosen]
            assert rest, "oracle picked more than the pool holds"
            best = max(
                rest,
                key=lambda i: (
                    MMR_LAM10 * rel[i]
                    - (10 - MMR_LAM10)
                    * (
                        max(
                            int(np.trunc(cos(i, s) * 1e6)) for s in chosen
                        )
                        if chosen
                        else 0
                    ),
                    -i,
                ),
            )
            assert r.vec_id == best, (
                f"query {qid} pick {r.pick_order}: oracle {r.vec_id}, "
                f"greedy argmax {best}"
            )
            chosen.append(best)
        assert len(got) == min(MMR_M, len(pool))
