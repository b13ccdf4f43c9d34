"""Declared bounds for every batch window partition (VERDICT r7 #2).

Spark's WindowExec co-locates ALL rows of one partition-key value in a
single task: a window keyed on a low-cardinality column over a
corpus-sized input serializes the whole group through one task at
scale. The scan/join/shuffle/UDF audits cannot see that family — it
survived seven rounds of them (pipe_skew_census, pipe_dataset_card,
pipe_pack_offsets, pipe_stratified_k, all fixed in r8) — so window
partition keys are now a GATED contract, pinned the way STREAM_PLANS
pins streaming state:

  * a Window guarded by a plan-level ``WindowGroupLimit`` (Spark's
    rank-limit pushdown: every key's run truncates to the limit before
    the sort buffer) is bounded BY THE PLAN — no declaration needed;
  * every other Window's partition signature must appear here with a
    rationale saying WHY the partition cannot grow with the corpus
    (count-table domain, per-entity bound, chunk compression, posted
    summary table, data-growing key);
  * ``tests/test_plan_audit.py`` fails on any undeclared window AND on
    any stale declaration, so this table can neither rot nor be padded
    ahead of the code.

Signatures are tuples of the partition key column names as they appear
in the physical plan (plan-id suffixes stripped); ``()`` is a GLOBAL
window — only legal over an already-aggregated, size-bounded table.
"""

from __future__ import annotations

# shared rationales ---------------------------------------------------------
_GROWING_USER = (
    "data-growing key: user cardinality grows with ingest; per-user rows "
    "are bounded by one entity's activity, not corpus size"
)
_GROWING_SUPP = (
    "data-growing key: l_suppkey cardinality grows with SF (TPC-H keeps "
    "per-supplier lineitems roughly constant as the table scales)"
)
_TOPK_RERANK = (
    "global rank over the ≤K-row TakeOrderedAndProject result: the "
    "top-K cut happens in the preceding distributed orderBy().limit(K) "
    "(r9 rewrite — InferWindowGroupLimit never fires for empty-"
    "partition windows, so the old rank-window form sorted the whole "
    "vocabulary in one task)"
)

WINDOW_BOUNDS: dict[str, dict[tuple[str, ...], str]] = {
    "ann_nprobe_sweep": {
        ("qid",): "per-probe-query candidate set: the scored table is "
                  "the materialized nprobe=max(SWEEP) candidates — ≤ "
                  "probed-cells × cell-members rows per query, "
                  "probe-bounded, never corpus-growing",
    },
    "text_bm25_index_append": {
        ("doc_id",): "per-document posting list: the dl prefix-sum runs over one doc's distinct terms, bounded by document length",
    },
    "stream_bm25_index_append": {
        ("doc_id",): "per-document posting list: the dl prefix-sum runs over one doc's distinct terms, bounded by document length",
    },
    "dedup_jaccard_prefix": {
        ("id",): "per-document shingle set: partition = one doc's distinct "
                 "shingles, bounded by document length",
    },
    "pipe_bigram_counts": {
        (): _TOPK_RERANK + " (bigram vocabulary)",
    },
    "pipe_bpe_encode": {
        ("doc_id",): "per-document token sequence: the offset prefix sum "
                     "runs over one doc's tokens, bounded by document "
                     "length",
    },
    "pipe_encode_serve": {
        ("doc_id",): "per-document token sequence: same offset prefix "
                     "sum as pipe_bpe_encode (shared _bpe_encode_body) "
                     "— bounded by document length",
    },
    "pipe_quantile_sketch": {
        ("source",): "(source, bin) histogram and (source, n_chars) "
                     "value-count tables — domain-bounded (bins = "
                     "domain/QSK_BINW; values collapse ties)",
        (): "global read-off over the corpus-level bin / value-count "
            "tables for the __merged__/__direct__ certificate rows — "
            "same domain bounds",
    },
    "pipe_dataset_card": {
        ("source",): "(source, n_toks) count table: partition = |distinct "
                     "token lengths| per source — domain-bounded, ties "
                     "collapse (r8 rewrite of the per-document rank)",
    },
    "pipe_encode_ids": {
        (): _TOPK_RERANK,
    },
    # pipe_ewma_user_value: the chunking row_number window of
    # operators/recurrence.py is now branch-selected (r12: a hot-key
    # probe proves every group fits the memory bound and takes the
    # single-fold path, so no Window node survives in the realistic
    # plan). When a hot key IS detected the chunked machinery still
    # runs with its ("k",) window — bounded per the module docstring
    # contract — but that branch never appears in a gated plan, so the
    # contract carries no entry (the stale-entry audit would fail on
    # one).
    "pipe_pack_offsets": {
        ("source", "chunk_id"): "≤ PACK_CHUNK(4096) rows per chunk by "
                                "doc-id distinctness (r8 chunked rewrite)",
        ("source",): "carry cumsum over the per-chunk summary table — "
                     "4096× smaller than the corpus (recurrence-device "
                     "bound; a 10⁹-doc source is ~250k summary rows)",
    },
    "ann_ivf_balance": {
        (): "global share/balance arithmetic over the KM_K(=8)-row "
            "cell-population census",
    },
    "pipe_epochs_budget": {
        (): "global sum windows over the per-source token census "
            "(~|sources|=20 rows; the corpus scans once into the "
            "census)",
    },
    "pipe_unimax_mixing": {
        (): "the UniMax water-filling closed form: sort/cumsum/census "
            "windows over the per-source token census (~|sources|=20 "
            "rows at any corpus size; the corpus scans once into the "
            "census)",
    },
    # text_rake_keywords' gaps-and-islands window (doc_id partition,
    # doc-length-bounded) runs inside the rake-ph cut_lineage
    # materialization, so only the top-K rerank window remains in the
    # returned plan
    "text_rake_keywords": {
        (): _TOPK_RERANK + " (RAKE phrase table)",
    },
    "pipe_curriculum_order": {
        (): "exact-quartile cumulative over the global (n_toks, count) "
            "table — |distinct doc lengths| rows, value-domain-bounded "
            "(the pipe_dataset_card device, global instead of "
            "per-source); phase assignment is scan-side against the "
            "broadcast 1-row threshold table",
    },
    "pipe_mix_temperature": {
        (): "global sum over the per-source count table (~|sources|=20 "
            "rows at any corpus size; the corpus scans once into the "
            "count agg)",
    },
    "q52_revenue_share": {
        (): "global sum over the per-nation aggregate (~25 rows; "
            "agg-then-window by construction, never the base table)",
    },
    "text_perplexity_buckets": {
        (): "global sum over the perplexity-bucket census (≤64 "
            "quarter-octave buckets at any corpus size)",
    },
    "pipe_quality_funnel": {
        (): "global cumulative over the ≤ |rules|+1 (=6) stage census rows",
    },
    "pipe_shard_assign": {
        ("shard", "b"): "corpus/(N_SHARDS·1024) rows per hash bucket "
                        "(r8 bucketed-rank rewrite)",
        ("shard",): "carry cumsum over the (shard, bucket) census — "
                    "≤ 1024 rows per shard",
    },
    "pipe_shuffle_audit": {
        ("decile",): "(decile, source) census table: ≤ |sources| rows per "
                     "decile",
    },
    "pipe_skew_census": {
        ("key_col",): "union of per-column TakeOrderedAndProject(limit="
                      "SKEW_K) branches: ≤ SKEW_K rows per audited column "
                      "(r8 rewrite of the fact-scale rank window)",
    },
    "pipe_stratified_k": {
        ("lang",): "hash-bucket census: ≤ STRAT_BUCKETS(1024) rows per "
                   "language (the rank window over survivors is "
                   "plan-bounded by WindowGroupLimit)",
    },
    "pipe_watermark_lateness": {
        ("user_id",): _GROWING_USER + "; running max is associative, so a "
                      "pathological hot key takes the recurrence chunk "
                      "device (docstring cites it)",
    },
    "q08_running_sum": {("l_suppkey",): _GROWING_SUPP},
    "q16_sessionize": {("user_id",): _GROWING_USER},
    "q20_asof_join": {("user_id",): _GROWING_USER},
    "q22_window_frames": {("l_suppkey",): _GROWING_SUPP},
    "q24_percentile_disc": {
        ("event_type",): "(type, value) count table: partition = |distinct "
                         "values| per type — ties collapse (r8 rewrite of "
                         "the per-event rank); continuous-domain companion "
                         "is pipe_quantile_sketch",
    },
    "q33_balance_distribution": {
        ("c_nationkey",): "(nation, balance) count table: partition = "
                          "|distinct balances| per nation — domain-bounded "
                          "(r8 rewrite of the per-customer window)",
        ("c_nationkey", "c_acctbal"): "tiebreak rank among equal balances: "
                                      "partition = ties on one balance "
                                      "value",
    },
    "q40_monthly_growth": {
        ("o_orderstatus",): "pre-aggregated monthly series: ≤ |months| "
                            "rows per status",
    },
    "q51_window_navigation": {("l_suppkey",): _GROWING_SUPP},
    "q54_session_conversion": {("user_id",): _GROWING_USER},
    "q66_binned_quantiles": {
        (): "global windows over the ≤ HIST_BINS(1024)-row histogram and "
            "the |distinct prices| value-count table (r8 rewrite of the "
            "exact side's corpus row_number sort)",
    },
    "text_winnow_fingerprints": {
        ("doc_id",): "per-document gram sequence, bounded by document "
                     "length (ROWS frame sorts per doc JVM-side, spills)",
    },
    "text_zipf_census": {
        (): "global rank over the FULL aggregated vocabulary count "
            "table — honestly: ONE spilling single-task sort of "
            "|distinct tokens| rows (Heaps' law: sublinear but "
            "unbounded). Acceptable for a diagnostic census run "
            "off-path; not a production-pipeline shape",
    },
    "pipe_vocab_topk": {
        (): _TOPK_RERANK,
    },
}
