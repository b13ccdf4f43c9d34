"""Training-data pipeline operators: deterministic sampling, weighted
dataset mixing, document chunking, and the composed clean-corpus
pipeline (quality filter → language filter → dedup).

These are the operations that sit between raw scans and the dedup/
similarity stages in a 100 TB corpus build. All selection is driven by
the portable 60-bit content hash — never ``rand()`` — so (a) results
are bit-reproducible across engines, runs, partitionings and task
retries, and (b) every query has an exact DuckDB oracle. Each operator
is scan-shaped (per-row, zero shuffles) except the dedup tail of the
composed pipeline, which is one aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jobx_spark.functions import dsum, dsum_sql, md5_long
from jobx_spark.operators.text import tokens
from jobx_spark.sources import load_table

_TOKS = "regexp_split_to_array(lower(trim(text)), '\\s+')"
_MD5 = "('0x'||substr(md5({e}),1,15))::BIGINT"


# --------------------------------------------------------------------------
# pipe_sample_hash — deterministic 5% sample. Hash-gating on content id
# replaces rand(): the same rows are sampled on any cluster, any
# partitioning, any retry — and downstream joins between two samples of
# related tables stay consistent (sample orders and lineitem by the
# same key → referential integrity survives).
# --------------------------------------------------------------------------
SAMPLE_PCT = 5


def pipe_sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    gate = md5_long(F.concat(F.lit("sample:"), F.col("doc_id").cast("string"))) % 100
    return (
        docs.filter(gate < SAMPLE_PCT)
        .select("doc_id", "source", "lang")
        .orderBy("doc_id")
    )


ORACLE_PIPE_SAMPLE = f"""
SELECT doc_id, source, lang
FROM documents
WHERE {_MD5.format(e="'sample:'||CAST(doc_id AS VARCHAR)")} % 100 < {SAMPLE_PCT}
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# pipe_mix_weighted — weighted dataset mixing: per-language acceptance
# rates (the "data mixture" step of corpus building). The rate gate is
# a per-row hash compare, so mixing 100 TB is a filter, not a shuffle;
# the observed mix converges to the configured weights by LLN.
# --------------------------------------------------------------------------
MIX_RATES = {"en": 1000, "de": 500, "fr": 500, "es": 250, "zh": 100}  # per-mille


def pipe_mix_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    gate = md5_long(F.concat(F.lit("mix:"), F.col("doc_id").cast("string"))) % 1000
    rate = F.lit(0)
    for lang, r in MIX_RATES.items():
        rate = F.when(F.col("lang") == lang, F.lit(r)).otherwise(rate)
    return (
        docs.filter(gate < rate)
        .groupBy("lang")
        .agg(F.count("*").alias("n_kept"))
        .orderBy("lang")
    )


_RATE_CASE = "CASE lang " + " ".join(
    f"WHEN '{lang}' THEN {r}" for lang, r in MIX_RATES.items()
) + " ELSE 0 END"

ORACLE_PIPE_MIX = f"""
SELECT lang, count(*) AS n_kept
FROM documents
WHERE {_MD5.format(e="'mix:'||CAST(doc_id AS VARCHAR)")} % 1000 < {_RATE_CASE}
GROUP BY lang
ORDER BY lang
"""


# --------------------------------------------------------------------------
# pipe_blocklist_scrub — term-blocklist masking (the PII/toxicity-scrub
# shape: replace blocked tokens, keep provenance counts). Pure map-side
# per-row array ops — no shuffle until the tiny per-lang rollup. The
# per-lang bit_xor over the scrubbed-text hash certifies the actual
# post-scrub CONTENT (order-insensitive), not just the counts, so the
# oracle proves the transform itself survived distribution.
# --------------------------------------------------------------------------
BLOCKLIST = ("customer", "key", "value")


def pipe_blocklist_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jobx_spark.functions import md5_long
    from jobx_spark.operators.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    toks = tokens("text")
    blocked = F.filter(toks, lambda t: t.isin(*BLOCKLIST))
    kept = F.filter(toks, lambda t: ~t.isin(*BLOCKLIST))
    scrubbed = docs.select(
        "doc_id",
        "lang",
        F.size(blocked).cast("long").alias("n_masked"),
        md5_long(F.array_join(kept, " ")).alias("scrub_hash"),
    )
    return (
        scrubbed.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum((F.col("n_masked") > 0).cast("long")).alias("docs_affected"),
            F.sum("n_masked").alias("total_masked"),
            F.bit_xor("scrub_hash").alias("content_xor"),
        )
        .orderBy("lang")
    )


_BL_IN = ", ".join(f"'{t}'" for t in BLOCKLIST)
_SCRUB_KEPT = f"array_to_string(list_filter({_TOKS}, t -> t NOT IN ({_BL_IN})), ' ')"
_N_MASKED = f"len(list_filter({_TOKS}, t -> t IN ({_BL_IN})))"

ORACLE_PIPE_BLOCKLIST = f"""
WITH s AS (
  SELECT doc_id, lang,
         CAST({_N_MASKED} AS BIGINT) AS n_masked,
         {_MD5.format(e=_SCRUB_KEPT)} AS scrub_hash
  FROM documents
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN n_masked > 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS docs_affected,
       CAST(sum(n_masked) AS BIGINT) AS total_masked,
       bit_xor(scrub_hash) AS content_xor
FROM s
GROUP BY lang
ORDER BY lang
"""


# --------------------------------------------------------------------------
# pipe_manifest — dataset integrity manifest: per-source row count,
# byte total, and an ORDER-INSENSITIVE content checksum (bit_xor over a
# row fingerprint covering every column). This is how a 100 TB copy is
# verified after migration/compaction without sorting anything: both
# sides compute the manifest independently (map-side combine → one tiny
# shuffle) and diff the ~|sources| rows.
# --------------------------------------------------------------------------
def pipe_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jobx_spark.functions import md5_long

    docs = load_table(spark, sf_dir, "documents")
    row_fp = md5_long(
        F.concat_ws(
            "\x1f",
            F.col("doc_id").cast("string"),
            F.col("text"),
            F.col("lang"),
            F.col("source"),
            F.col("n_chars").cast("string"),
        )
    )
    return (
        docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("n_chars").alias("total_chars"),
            F.bit_xor(row_fp).alias("content_xor"),
        )
        .orderBy("source")
    )


_ROW_FP = (
    "CAST(doc_id AS VARCHAR) || chr(31) || text || chr(31) || lang || chr(31)"
    " || source || chr(31) || CAST(n_chars AS VARCHAR)"
)

ORACLE_PIPE_MANIFEST = f"""
SELECT source,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       bit_xor({_MD5.format(e=_ROW_FP)}) AS content_xor
FROM documents
GROUP BY source
ORDER BY source
"""


# --------------------------------------------------------------------------
# pipe_table_diff — dataset regression diff: the rows that changed
# between two versions of a table, as tagged EXCEPT ALL in both
# directions. Here the two "versions" are two deterministic hash-gated
# samples (gates [0,50) vs [25,75)) of documents, so the diff is exactly
# the non-overlapping gate ranges. exceptAll is a hash anti-aggregation
# — one shuffle per side keyed on the full row, no sort; at 100 TB this
# is how you audit a migration beyond pipe_manifest's checksum: the
# manifest says WHETHER something changed, the diff says WHAT.
# --------------------------------------------------------------------------
def pipe_table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jobx_spark.functions import md5_long

    docs = load_table(spark, sf_dir, "documents")
    gate = md5_long(F.concat(F.lit("diff:"), F.col("doc_id").cast("string"))) % 100
    cols = ["doc_id", "lang", "source"]
    v1 = docs.filter(gate < 50).select(*cols)
    v2 = docs.filter((gate >= 25) & (gate < 75)).select(*cols)
    removed = v1.exceptAll(v2).withColumn("change", F.lit("removed"))
    added = v2.exceptAll(v1).withColumn("change", F.lit("added"))
    return removed.unionByName(added).orderBy("doc_id", "change")


_DIFF_GATE = _MD5.format(e="'diff:'||CAST(doc_id AS VARCHAR)") + " % 100"

ORACLE_PIPE_DIFF = f"""
WITH v1 AS (
  SELECT doc_id, lang, source FROM documents WHERE {_DIFF_GATE} < 50
), v2 AS (
  SELECT doc_id, lang, source FROM documents
  WHERE {_DIFF_GATE} >= 25 AND {_DIFF_GATE} < 75
)
SELECT doc_id, lang, source, 'removed' AS change
FROM (SELECT * FROM v1 EXCEPT ALL SELECT * FROM v2)
UNION ALL
SELECT doc_id, lang, source, 'added' AS change
FROM (SELECT * FROM v2 EXCEPT ALL SELECT * FROM v1)
ORDER BY doc_id, change
"""


# --------------------------------------------------------------------------
# pipe_text_chunks — overlapping token-window chunking (stride 40,
# width 50): the context-window packing precursor. Pure per-row explode:
# at scale this is a map-only job whose output feeds tokenization.
# Chunk content is certified by hash so the result stays narrow.
# --------------------------------------------------------------------------
CHUNK, STRIDE = 50, 40


def pipe_text_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    n = F.size(toks)
    starts = F.sequence(F.lit(0), F.floor((n - 1) / STRIDE).cast("int"))
    chunk = F.slice(F.col("toks"), F.col("chunk_id") * STRIDE + 1, CHUNK)
    return (
        docs.select("doc_id", toks.alias("toks"), F.explode(starts).alias("chunk_id"))
        .select(
            "doc_id",
            F.col("chunk_id").cast("bigint").alias("chunk_id"),
            F.size(chunk).cast("bigint").alias("n_chunk_tokens"),
            md5_long(F.array_join(chunk, " ")).alias("chunk_hash"),
        )
        .orderBy("doc_id", "chunk_id")
    )


ORACLE_PIPE_CHUNKS = f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
c AS (
  SELECT doc_id, toks, unnest(generate_series(0, CAST(floor((len(toks) - 1) / {STRIDE}) AS BIGINT))) AS chunk_id
  FROM t
)
SELECT doc_id,
       chunk_id,
       CAST(len(list_slice(toks, chunk_id * {STRIDE} + 1, chunk_id * {STRIDE} + {CHUNK})) AS BIGINT)
           AS n_chunk_tokens,
       {_MD5.format(e=f"array_to_string(list_slice(toks, chunk_id * {STRIDE} + 1, chunk_id * {STRIDE} + {CHUNK}), ' ')")}
           AS chunk_hash
FROM c
ORDER BY doc_id, chunk_id
"""


# --------------------------------------------------------------------------
# pipe_clean_corpus — the composed pipeline: token/punctuation quality
# gates → language-ID filter (en) → exact dedup keeping the min-id
# representative. Everything before the dedup is scan-shaped; the dedup
# is one hash aggregation on the 60-bit digest. This is the flagship
# "would run on 100 TB unchanged" query: filters push into the scan,
# and the only shuffle carries (digest, id, source).
# --------------------------------------------------------------------------
MIN_TOKENS, MAX_PUNCT_RATIO = 10, 0.2


def pipe_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jobx_spark.operators.dedup import normalized_digest
    from jobx_spark.operators.text import lang_guess, punct_count, token_count

    docs = load_table(spark, sf_dir, "documents")
    filtered = docs.filter(
        (token_count(F.col("text")) >= MIN_TOKENS)
        & (punct_count(F.col("text")).cast("double") / F.length("text") < MAX_PUNCT_RATIO)
        & (lang_guess(F.col("text")) == "en")
    )
    keep = F.min(F.struct(F.col("doc_id"), F.col("source")))
    return (
        filtered.withColumn("digest", normalized_digest("text"))
        .groupBy("digest")
        .agg(keep.alias("k"))
        .select(F.col("k.doc_id").alias("doc_id"), F.col("k.source").alias("source"))
        .orderBy("doc_id")
    )


def _clean_corpus_oracle() -> str:
    from jobx_spark.operators.text import LANG_STOPWORDS

    langs = sorted(LANG_STOPWORDS)
    scores = {
        lang: f"len(list_intersect(toks, {LANG_STOPWORDS[lang]!r}))" for lang in langs
    }
    best = "greatest(" + ", ".join(scores.values()) + ")"
    cases = " ".join(
        f"WHEN {scores[lang]} = {best} AND {best} > 0 THEN '{lang}'" for lang in langs
    )
    digest = _MD5.format(e="regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')")
    return f"""
WITH t AS (SELECT doc_id, source, text, {_TOKS} AS toks FROM documents),
f AS (
  SELECT doc_id, source, text FROM t
  WHERE len(toks) >= {MIN_TOKENS}
    AND length(regexp_replace(text, '[^.,!?;:]', '', 'g'))::DOUBLE / length(text) < {MAX_PUNCT_RATIO}
    AND (CASE {cases} ELSE 'und' END) = 'en'
),
d AS (
  SELECT {digest} AS dg, min(doc_id) AS keep_id FROM f GROUP BY 1
)
SELECT f.doc_id AS doc_id, f.source AS source
FROM f JOIN d ON f.doc_id = d.keep_id
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# pipe_pack_offsets — context-window packing (the streaming concat-and-
# split packing used for LLM training): documents concatenate in
# deterministic (source, doc_id) order; each doc's token span maps onto
# fixed 512-token windows. Per doc: its start offset in the stream, the
# first window it lands in, and how many windows it spans.
# Scale shape (VERDICT r7 #1 — the old single per-source running cumsum
# landed a whole source in ONE window task): prefix sums compose
# associatively, so the cumsum runs CHUNKED, the same two-level shape
# as the operators/recurrence.py transfer-function device —
#   1. chunk by doc_id div PACK_CHUNK (monotone in the sort order, so
#      chunk boundaries respect it; ≤ PACK_CHUNK rows per chunk by
#      doc-id distinctness): a local cumsum per (source, chunk) window
#      — every window partition ≤ PACK_CHUNK rows;
#   2. per-chunk totals (map-side-combinable) roll up 4096× smaller,
#      and the carry-in per chunk is a cumsum along THAT summary table
#      (a 10⁹-doc source becomes ~250k summary rows in the one
#      source-keyed window — the recurrence device's accepted bound);
#   3. carry-in joins back on (source, chunk_id) — co-partitioned,
#      ≤ PACK_CHUNK rows per key, no hot key possible.
# Same oracle, same answer, no corpus-sized window partition.
# --------------------------------------------------------------------------
PACK_WINDOW = 512
PACK_CHUNK = 4096


def pipe_pack_offsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    n_toks = F.size(tokens(F.col("text"))).cast("bigint")
    base = docs.select("doc_id", "source", n_toks.alias("n_tokens")).withColumn(
        "chunk_id", F.expr(f"doc_id div {PACK_CHUNK}")
    )
    local_w = (
        W.partitionBy("source", "chunk_id")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    local = base.withColumn("local_end", F.sum("n_tokens").over(local_w))
    carry_w = (
        W.partitionBy("source")
        .orderBy("chunk_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    carry = (
        base.groupBy("source", "chunk_id")
        .agg(F.sum("n_tokens").alias("chunk_sum"))
        .select(
            "source", "chunk_id",
            F.coalesce(F.sum("chunk_sum").over(carry_w), F.lit(0)).alias(
                "chunk_start"
            ),
        )
    )
    stamped = local.join(carry, ["source", "chunk_id"]).withColumn(
        "end_offset", F.col("chunk_start") + F.col("local_end")
    )
    start = F.col("end_offset") - F.col("n_tokens")
    return stamped.select(
        "doc_id",
        "source",
        "n_tokens",
        start.alias("start_offset"),
        F.floor(start / PACK_WINDOW).cast("bigint").alias("first_window"),
        (
            F.floor((F.col("end_offset") - 1) / PACK_WINDOW)
            - F.floor(start / PACK_WINDOW)
            + 1
        ).cast("bigint").alias("n_windows"),
    ).orderBy("doc_id")


ORACLE_PIPE_PACK = f"""
WITH t AS (
  SELECT doc_id, source, CAST(len({_TOKS}) AS BIGINT) AS n_tokens
  FROM documents
), s AS (
  SELECT doc_id, source, n_tokens,
         SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS end_offset
  FROM t
)
SELECT doc_id, source, n_tokens,
       CAST(end_offset - n_tokens AS BIGINT) AS start_offset,
       CAST(floor((end_offset - n_tokens) / {PACK_WINDOW}) AS BIGINT) AS first_window,
       CAST(floor((end_offset - 1) / {PACK_WINDOW})
            - floor((end_offset - n_tokens) / {PACK_WINDOW}) + 1 AS BIGINT) AS n_windows
FROM s
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# pipe_bpe_token_count — token counting under a BPE-ish pre-tokenizer
# (word runs vs single non-space symbols), beside the whitespace count.
# Pure regex extraction, scan-shaped.
# --------------------------------------------------------------------------
_BPE_RE = r"[A-Za-z0-9_]+|[^A-Za-z0-9_\s]"


def pipe_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(tokens(F.col("text"))).cast("bigint").alias("ws_tokens"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(_BPE_RE), 0))
        .cast("bigint")
        .alias("bpe_tokens"),
    ).orderBy("doc_id")


ORACLE_PIPE_BPE = f"""
SELECT doc_id,
       CAST(len({_TOKS}) AS BIGINT) AS ws_tokens,
       CAST(len(regexp_extract_all(text, '{_BPE_RE}')) AS BIGINT) AS bpe_tokens
FROM documents
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# pipe_tokenizer_fertility — per-language tokenizer diagnostics: the
# FERTILITY (sub-word tokens per whitespace word, in ppm) and the
# compression ratio (characters per sub-word token, in milli) of the
# BPE-ish tokenizer over each language slice. These are the two
# numbers tokenizer evaluations report to decide whether a vocabulary
# under-serves a language (fertility ≫ 1 ⇒ words shatter into many
# pieces ⇒ inflated sequence lengths and cost for that language).
# Pure scan + one language-keyed rollup; integer cross-multiplies only.
# --------------------------------------------------------------------------
def pipe_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    per_doc = docs.select(
        "lang",
        F.size(tokens(F.col("text"))).cast("bigint").alias("ws"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(_BPE_RE), 0))
        .cast("bigint")
        .alias("bpe"),
        F.col("n_chars").cast("bigint").alias("chars"),
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("ws").alias("ws_tokens"),
            F.sum("bpe").alias("bpe_tokens"),
            F.sum("chars").alias("n_chars"),
        )
        .select(
            "lang", "n_docs", "ws_tokens", "bpe_tokens", "n_chars",
            F.expr("(bpe_tokens * 1000000) div ws_tokens")
            .alias("fertility_ppm"),
            F.expr("(n_chars * 1000) div bpe_tokens")
            .alias("chars_per_token_milli"),
        )
        .orderBy("lang")
    )


ORACLE_PIPE_TOKENIZER_FERTILITY = f"""
WITH per_doc AS (
  SELECT lang,
         CAST(len({_TOKS}) AS BIGINT) AS ws,
         CAST(len(regexp_extract_all(text, '{_BPE_RE}')) AS BIGINT) AS bpe,
         CAST(n_chars AS BIGINT) AS chars
  FROM documents
), agg AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(SUM(ws) AS BIGINT) AS ws_tokens,
         CAST(SUM(bpe) AS BIGINT) AS bpe_tokens,
         CAST(SUM(chars) AS BIGINT) AS n_chars
  FROM per_doc GROUP BY lang
)
SELECT lang, n_docs, ws_tokens, bpe_tokens, n_chars,
       (bpe_tokens * 1000000) // ws_tokens AS fertility_ppm,
       (n_chars * 1000) // bpe_tokens AS chars_per_token_milli
FROM agg
ORDER BY lang
"""


# --------------------------------------------------------------------------
# pipe_gapfill_hours — calendar densification: hourly event counts per
# type with MISSING HOURS filled with zeros (sequence + explode builds
# the dense calendar; left join fills). The calendar side is
# (hours × types) rows — tiny relative to events at any scale — and the
# join key is (hour, type), so the fill is one broadcast-ready join.
# --------------------------------------------------------------------------
def pipe_gapfill_hours(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t = load_table(spark, sf_dir, "events")
    hourly = (
        ev.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"),
            "event_type",
        ).agg(F.count("*").alias("n"))
    )
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    types = ev.select("event_type").distinct()
    calendar = (
        bounds.select(
            F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("hour")
        )
        .crossJoin(types)
    )
    return (
        calendar.join(hourly, ["hour", "event_type"], "left_outer")
        .select(
            "hour",
            "event_type",
            F.coalesce("n", F.lit(0)).alias("n"),
        )
        .orderBy("hour", "event_type")
    )


ORACLE_PIPE_GAPFILL = """
WITH b AS (
  SELECT date_trunc('hour', min(ts)) AS lo, date_trunc('hour', max(ts)) AS hi
  FROM events
), cal AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour FROM b
), types AS (SELECT DISTINCT event_type FROM events),
hourly AS (
  SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n
  FROM events GROUP BY 1, 2
)
SELECT cal.hour AS hour, types.event_type AS event_type,
       coalesce(hourly.n, 0) AS n
FROM cal CROSS JOIN types
LEFT OUTER JOIN hourly ON hourly.hour = cal.hour
                      AND hourly.event_type = types.event_type
ORDER BY hour, event_type
"""


# --------------------------------------------------------------------------
# pipe_rollup_reagg — continuous-aggregate re-rollup (the hypertable
# pattern): hourly partial aggregates re-aggregated to daily WITHOUT
# touching the raw events again. Counts merge by summing; value totals
# stay DECIMAL(38,8) through both levels so the two-level merge is
# exact and order-independent — the oracle computes daily straight from
# the raw table, proving partial+final == direct. At 100 TB this is the
# materialized-rollup maintenance path: the daily pass reads hours ×
# types rows, not events, and the same merge works incrementally as new
# hours land.
# --------------------------------------------------------------------------
def pipe_rollup_reagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour"), "event_type"
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(38,8)")).alias("dec_sum"),
    )
    return (
        hourly.groupBy(
            F.date_trunc("day", F.col("hour")).alias("day"), "event_type"
        )
        .agg(
            F.sum("n").alias("n_events"),
            F.sum("dec_sum").cast("string").cast("double").alias("total_value"),
            F.count("*").alias("n_hours"),
        )
        .orderBy("day", "event_type")
    )


ORACLE_PIPE_ROLLUP_REAGG = """
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type,
       count(*) AS n_events,
       CAST(CAST(SUM(CAST(value AS DECIMAL(38,8))) AS VARCHAR) AS DOUBLE)
           AS total_value,
       count(DISTINCT date_trunc('hour', ts)) AS n_hours
FROM events
GROUP BY 1, 2
ORDER BY 1, 2
"""


# --------------------------------------------------------------------------
# pipe_minmax_scale — per-group feature normalization through the
# grouped-map Arrow path (`applyInPandas`): each event_type's values
# min-max scaled inside a pandas batch. This is the template for
# custom per-group logic Spark can't express declaratively — the group
# arrives as ONE Arrow-backed DataFrame, so the shuffle is the only
# distributed cost and the Python work is vectorized numpy, not
# per-row. The arithmetic ((x−lo)/(hi−lo) in float64) is IEEE-identical
# to the SQL window formulation, which is exactly what the oracle runs
# — proving the Arrow round-trip is value-exact. At 100 TB the caveat
# is group size (a group must fit one executor's memory); for unbounded
# groups, compute lo/hi by aggregation and scale with a column
# expression instead.
# --------------------------------------------------------------------------
def pipe_minmax_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    ev = load_table(spark, sf_dir, "events")
    sub = ev.select("event_id", "event_type", "value")

    def _scale(pdf: "pd.DataFrame") -> "pd.DataFrame":
        lo, hi = pdf["value"].min(), pdf["value"].max()
        out = pdf[["event_id", "event_type"]].copy()
        rng = hi - lo
        out["scaled"] = (pdf["value"] - lo) / rng if rng != 0 else 0.0
        return out

    return (
        sub.groupBy("event_type")
        .applyInPandas(_scale, "event_id long, event_type string, scaled double")
        .orderBy("event_id")
    )


ORACLE_PIPE_MINMAX = """
SELECT event_id, event_type,
       (value - MIN(value) OVER w)
           / (MAX(value) OVER w - MIN(value) OVER w) AS scaled
FROM events
WINDOW w AS (PARTITION BY event_type)
ORDER BY event_id
"""


# --------------------------------------------------------------------------
# pipe_corpus_stats — the "dataset card": per (lang, source) doc counts,
# exact token totals, mean/extreme lengths, and each cell's share of the
# corpus (a windowless scalar subquery → one broadcast value). One
# explode-free pass: token counts come from the whitespace-split array
# size, so 100 TB of text is a scan + a tiny two-key aggregation.
# --------------------------------------------------------------------------
def pipe_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    n_toks = F.size(tokens(F.col("text"))).cast("long")
    cells = (
        docs.groupBy("lang", "source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(n_toks).alias("total_tokens"),
            F.min(n_toks).alias("min_tokens"),
            F.max(n_toks).alias("max_tokens"),
            F.sum("n_chars").alias("total_chars"),
        )
    )
    total = docs.select(F.count("*").alias("corpus_docs"))
    return (
        cells.crossJoin(F.broadcast(total))
        .select(
            "lang",
            "source",
            "n_docs",
            "total_tokens",
            (F.col("total_tokens").cast("double") / F.col("n_docs"))
            .alias("mean_tokens"),
            "min_tokens",
            "max_tokens",
            "total_chars",
            (F.col("n_docs").cast("double") / F.col("corpus_docs"))
            .alias("doc_share"),
        )
        .orderBy("lang", "source")
    )


ORACLE_PIPE_CORPUS_STATS = f"""
SELECT lang, source,
       count(*) AS n_docs,
       CAST(SUM(len({_TOKS})) AS BIGINT) AS total_tokens,
       CAST(CAST(SUM(len({_TOKS})) AS BIGINT) AS DOUBLE) / count(*)
           AS mean_tokens,
       CAST(MIN(len({_TOKS})) AS BIGINT) AS min_tokens,
       CAST(MAX(len({_TOKS})) AS BIGINT) AS max_tokens,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(count(*) AS DOUBLE) / (SELECT count(*) FROM documents)
           AS doc_share
FROM documents
GROUP BY lang, source
ORDER BY lang, source
"""


# --------------------------------------------------------------------------
# pipe_vocab_topk — vocabulary build (the tokenizer-training step): the
# top-K corpus tokens by frequency, ranked. explode → groupBy(token)
# does partial aggregation before the exchange, so the shuffle carries
# one (token, partial_count) row per distinct token per input partition
# — bounded by vocabulary size, not corpus size. The top-K cut is a
# global orderBy().limit(K) — TakeOrderedAndProject, a distributed
# partial top-K (each task keeps its local K, the driver merges) — NOT
# a global rank window: Spark's InferWindowGroupLimit never fires for
# empty-partition windows (verified r9), so the window form would
# funnel the ENTIRE vocabulary (10⁹ distinct tokens at web scale,
# Heaps' law) through one task's sort. The rank is then recomputed
# over the ≤K-row result, where the same total order (n desc, token)
# reproduces it exactly. Ties break on the token itself so the cut at
# K is deterministic cross-engine.
# --------------------------------------------------------------------------
VOCAB_K = 200


def pipe_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select(F.explode(tokens(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
    )
    order = [F.col("n").desc(), F.col("token")]
    topk = counts.orderBy(*order).limit(VOCAB_K)
    return (
        topk.withColumn("rank", F.row_number().over(W.orderBy(*order)))
        .orderBy("rank")
    )


ORACLE_PIPE_VOCAB = f"""
WITH tok AS (SELECT unnest({_TOKS}) AS token FROM documents),
c AS (SELECT token, count(*) AS n FROM tok GROUP BY token),
r AS (
  SELECT token, CAST(n AS BIGINT) AS n,
         CAST(row_number() OVER (ORDER BY n DESC, token) AS INTEGER) AS rank
  FROM c
)
SELECT token, n, rank FROM r WHERE rank <= {VOCAB_K} ORDER BY rank
"""


# --------------------------------------------------------------------------
# pipe_bigram_counts — n-gram language-model statistics: the top-K
# token bigrams with occurrence counts and the count of distinct
# documents containing each (the document-frequency side of
# contamination / memorization checks). Same vocabulary-bounded
# shuffle argument as pipe_vocab_topk: partial aggregation collapses
# repeats before the exchange, and the ranking window runs over the
# aggregated bigram table only.
# --------------------------------------------------------------------------
BIGRAM_K = 100


def pipe_bigram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from jobx_spark.operators.text import gram_rows

    docs = load_table(spark, sf_dir, "documents")
    # Arrow gram producer (bigram strings, multiset)
    bg = gram_rows(docs, ["doc_id"], "text", ns=(2,), emit="gram").withColumnRenamed(
        "g", "bigram"
    )
    counts = bg.groupBy("bigram").agg(
        F.count("*").alias("n"),
        F.count_distinct("doc_id").alias("n_docs"),
    )
    # TakeOrderedAndProject top-K, rank recomputed over ≤K rows (the
    # pipe_vocab_topk device — InferWindowGroupLimit never fires for
    # empty-partition windows, so the rank-window form would sort the
    # whole bigram vocabulary in one task)
    order = [F.col("n").desc(), F.col("bigram")]
    topk = counts.orderBy(*order).limit(BIGRAM_K)
    return (
        topk.withColumn("rank", F.row_number().over(W.orderBy(*order)))
        .orderBy("rank")
    )


_BIGRAMS = (
    f"list_transform(generate_series(1, greatest(len({_TOKS})-1, 0)),"
    f" i -> array_to_string(list_slice({_TOKS}, i, i+1), ' '))"
)
ORACLE_PIPE_BIGRAMS = f"""
WITH bg AS (
  SELECT doc_id, unnest({_BIGRAMS}) AS bigram FROM documents
),
c AS (
  SELECT bigram, count(*) AS n, count(DISTINCT doc_id) AS n_docs
  FROM bg GROUP BY bigram
),
r AS (
  SELECT bigram, CAST(n AS BIGINT) AS n, CAST(n_docs AS BIGINT) AS n_docs,
         CAST(row_number() OVER (ORDER BY n DESC, bigram) AS INTEGER) AS rank
  FROM c
)
SELECT bigram, n, n_docs, rank FROM r WHERE rank <= {BIGRAM_K} ORDER BY rank
"""


# --------------------------------------------------------------------------
# pipe_length_buckets — curriculum / batch-shape report: documents
# bucketed by token length on fixed boundaries (fixed, not ntile, so
# bucket membership is a per-row expression — no shuffle to assign, and
# the same doc lands in the same bucket at any scale). One scan + a
# bucket-cardinality aggregation.
# --------------------------------------------------------------------------
LENGTH_BOUNDS = [16, 32, 48, 64]  # upper-exclusive bucket edges


def pipe_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    n_toks = F.size(tokens(F.col("text"))).cast("long")
    bucket = F.lit(f"{LENGTH_BOUNDS[-1]}+")
    for lo, hi in reversed(list(zip([0] + LENGTH_BOUNDS[:-1], LENGTH_BOUNDS))):
        bucket = F.when(n_toks < hi, F.lit(f"{lo:03d}-{hi:03d}")).otherwise(bucket)
    return (
        docs.select(bucket.alias("bucket"), n_toks.alias("n_toks"))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_toks").alias("total_tokens"),
            F.min("n_toks").alias("min_tokens"),
            F.max("n_toks").alias("max_tokens"),
        )
        .orderBy("bucket")
    )


def _length_buckets_case() -> str:
    arms = " ".join(
        f"WHEN len({_TOKS}) < {hi} THEN '{lo:03d}-{hi:03d}'"
        for lo, hi in zip([0] + LENGTH_BOUNDS[:-1], LENGTH_BOUNDS)
    )
    return f"CASE {arms} ELSE '{LENGTH_BOUNDS[-1]}+' END"


ORACLE_PIPE_LENGTH_BUCKETS = f"""
SELECT {_length_buckets_case()} AS bucket,
       count(*) AS n_docs,
       CAST(SUM(len({_TOKS})) AS BIGINT) AS total_tokens,
       CAST(MIN(len({_TOKS})) AS BIGINT) AS min_tokens,
       CAST(MAX(len({_TOKS})) AS BIGINT) AS max_tokens
FROM documents
GROUP BY bucket
ORDER BY bucket
"""


# --------------------------------------------------------------------------
# pipe_split_train_val_test — deterministic 3-way dataset split: the
# hash gate buckets [0,90) / [90,95) / [95,100) assign every doc to
# train/val/test identically on any cluster/run/retry (same guarantee
# as pipe_sample_hash, extended to a partition of the corpus). Output
# is the split × lang census used to sanity-check mixture drift.
# --------------------------------------------------------------------------
def pipe_split_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    gate = md5_long(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))) % 100
    split = (
        F.when(gate < 90, F.lit("train"))
        .when(gate < 95, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        docs.select(split.alias("split"), "lang")
        .groupBy("split", "lang")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("split", "lang")
    )


_SPLIT_GATE = _MD5.format(e="'split:'||CAST(doc_id AS VARCHAR)") + " % 100"
ORACLE_PIPE_SPLIT = f"""
SELECT CASE WHEN {_SPLIT_GATE} < 90 THEN 'train'
            WHEN {_SPLIT_GATE} < 95 THEN 'val'
            ELSE 'test' END AS split,
       lang, count(*) AS n_docs
FROM documents
GROUP BY split, lang
ORDER BY split, lang
"""


# --------------------------------------------------------------------------
# pipe_sample_join — referential-integrity sampling: gate ORDERS by the
# content hash, then take each sampled order's lineitems via join. The
# gate is on the JOIN KEY, so "sample both tables at 5%" degenerates to
# one gate + one equi-join — every sampled order arrives with ALL its
# lineitems (row-level sampling of each table independently would keep
# ~5% × 5% of pairs and break every downstream per-order aggregate).
# At 100 TB: the gate pushes into both scans (it's a pure column
# expression on each side), the join shuffles only the 5% survivors.
# --------------------------------------------------------------------------
def pipe_sample_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    gate_o = (
        md5_long(F.concat(F.lit("osample:"), F.col("o_orderkey").cast("string")))
        % 100
    )
    gate_l = (
        md5_long(F.concat(F.lit("osample:"), F.col("l_orderkey").cast("string")))
        % 100
    )
    s_orders = orders.filter(gate_o < SAMPLE_PCT)
    s_li = li.filter(gate_l < SAMPLE_PCT)
    return (
        s_orders.join(s_li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
            F.count_distinct("o_orderkey").alias("n_orders"),
            F.count("*").alias("n_lineitems"),
            dsum("l_quantity").alias("total_qty"),
        )
        .orderBy("o_orderpriority")
    )


_OGATE = _MD5.format(e="'osample:'||CAST(o_orderkey AS VARCHAR)") + " % 100"
_LGATE = _MD5.format(e="'osample:'||CAST(l_orderkey AS VARCHAR)") + " % 100"
ORACLE_PIPE_SAMPLE_JOIN = f"""
SELECT o_orderpriority,
       count(DISTINCT o_orderkey) AS n_orders,
       count(*) AS n_lineitems,
       {dsum_sql('l_quantity')} AS total_qty
FROM (SELECT * FROM orders WHERE {_OGATE} < {SAMPLE_PCT}) o
JOIN (SELECT * FROM lineitem WHERE {_LGATE} < {SAMPLE_PCT}) l
  ON o.o_orderkey = l.l_orderkey
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# --------------------------------------------------------------------------
# pipe_sample_fixed_k — fixed-SIZE uniform sample (the "give me exactly
# K documents" ask that rand()-based reservoir sampling usually answers).
# Ordering by the content hash and taking the first K is an exact
# uniform sample without replacement, and Catalyst executes
# orderBy+limit as TakeOrderedAndProject: every task keeps only its
# local top-K rows by hash, the driver merges K-sized heaps — no global
# sort, no reservoir state, no second pass. At 100 TB this is one scan
# with O(K) memory per task, and the selected set is independent of
# partitioning, task retries, and cluster size (same rows every run).
# --------------------------------------------------------------------------
FIXED_K = 500


def pipe_sample_fixed_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    h = md5_long(F.concat(F.lit("ksample:"), F.col("doc_id").cast("string")))
    return (
        docs.select("doc_id", "lang", "source", h.alias("h"))
        .orderBy("h", "doc_id")
        .limit(FIXED_K)
        .select("doc_id", "lang", "source")
    )


_KGATE = _MD5.format(e="'ksample:'||CAST(doc_id AS VARCHAR)")
ORACLE_PIPE_SAMPLE_FIXED_K = f"""
SELECT doc_id, lang, source
FROM documents
ORDER BY {_KGATE}, doc_id
LIMIT {FIXED_K}
"""


# --------------------------------------------------------------------------
# pipe_stratified_k — exactly K documents PER STRATUM (here: language),
# the balanced-evaluation-set draw. Same hash-order trick as
# pipe_sample_fixed_k but rank within each group, with the per-stratum
# HASH-THRESHOLD PRE-FILTER in front (VERDICT r7 #1 — the old plan
# ranked EVERY document of a language through one window task):
#   1. a (lang, hash-bucket) census — map-side-combinable, ≤ |langs|·B
#      rows (B = 1024 buckets over the 60-bit hash);
#   2. per lang, the first bucket whose cumulative count reaches K (a
#      window over ≤ B census rows — bounded by B, not the corpus);
#   3. keep only rows at-or-below that bucket (broadcast lang→bucket
#      map; a lang with < K docs keeps everything). ≥ K rows survive
#      by construction, and no discarded row can be in the top K: every
#      row in a later bucket hashes above every kept row.
#   4. rank the SURVIVORS per lang — the window partition is now
#      ≤ K + n_lang/B rows (a 10⁹-doc language ranks ~10⁶ rows, not
#      10⁹), and the rank semantics are bit-identical to ranking all.
# Deterministic across clusters/retries like every sampler here.
# --------------------------------------------------------------------------
STRAT_K = 100
STRAT_BUCKETS = 1024
_STRAT_BDIV = (1 << 60) // STRAT_BUCKETS


def pipe_stratified_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    h = md5_long(F.concat(F.lit("strat:"), F.col("doc_id").cast("string")))
    base = docs.select("doc_id", "lang", "source", h.alias("h")).withColumn(
        "b", F.expr(f"h div {_STRAT_BDIV}")
    )
    cum_w = (
        W.partitionBy("lang").orderBy("b")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cutoff = (
        base.groupBy("lang", "b")
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn("cum", F.sum("c").over(cum_w))
        .filter(F.col("cum") >= STRAT_K)
        .groupBy("lang")
        .agg(F.min("b").alias("b_cut"))
    )
    survivors = base.join(F.broadcast(cutoff), "lang", "left").filter(
        # null b_cut = the lang never reaches K docs: keep everything
        F.col("b") <= F.coalesce(F.col("b_cut"), F.lit(STRAT_BUCKETS))
    )
    w = W.partitionBy("lang").orderBy(F.col("h").asc(), F.col("doc_id").asc())
    return (
        survivors.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= STRAT_K)
        .select("doc_id", "lang", "source")
        .orderBy("lang", "doc_id")
    )


_STRAT_H = _MD5.format(e="'strat:'||CAST(doc_id AS VARCHAR)")
ORACLE_PIPE_STRATIFIED_K = f"""
SELECT doc_id, lang, source
FROM documents
QUALIFY row_number() OVER (PARTITION BY lang ORDER BY {_STRAT_H}, doc_id) <= {STRAT_K}
ORDER BY lang, doc_id
"""


# --------------------------------------------------------------------------
# pipe_pii_scrub — regex PII redaction (the scrub pass every training
# corpus runs before tokenization). Patterns are applied in order
# (IP → email → bare digit run) so a digit inside an IP is redacted as
# part of the IP, not as a second <NUM> hit; match counts are taken per
# stage on the partially-scrubbed string, exactly as the redactor sees
# it. Everything is a per-row regexp_count/regexp_replace chain — pure
# scan shape, zero shuffles before the final per-type rollup, so 100 TB
# is embarrassingly parallel. The content XOR-hash lets the oracle
# verify the redacted BYTES, not just the counts.
# --------------------------------------------------------------------------
PII_PATTERNS = [
    ("[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}", "<IP>"),
    ("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("[0-9]+", "<NUM>"),
]


def pii_scrub_rollup(rel: DataFrame) -> DataFrame:
    """Per-event-type PII-redaction rollup over any relation with
    (event_type, props) — batch table or stream alike (the expression
    chain is stateless, so the same plan fragment serves both)."""
    scrubbed = F.col("props")
    counts = []
    for pat, tag in PII_PATTERNS:
        counts.append(F.regexp_count(scrubbed, F.lit(pat)))
        scrubbed = F.regexp_replace(scrubbed, pat, tag)
    hit = counts[0] + counts[1] + counts[2]
    per_row = rel.select(
        "event_type",
        counts[0].cast("long").alias("n_ip"),
        counts[1].cast("long").alias("n_email"),
        counts[2].cast("long").alias("n_num"),
        (hit > 0).cast("long").alias("has_pii"),
        md5_long(scrubbed).alias("h"),
    )
    return per_row.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("has_pii").alias("events_with_pii"),
        F.sum("n_ip").alias("ip_hits"),
        F.sum("n_email").alias("email_hits"),
        F.sum("n_num").alias("num_hits"),
        F.bit_xor("h").alias("scrub_xor"),
    )


def pipe_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return pii_scrub_rollup(events).orderBy("event_type")


def _pii_oracle() -> str:
    s = "props"
    stages = []
    for pat, tag in PII_PATTERNS:
        stages.append(f"len(regexp_extract_all({s}, '{pat}'))")
        s = f"regexp_replace({s}, '{pat}', '{tag}', 'g')"
    n_ip, n_email, n_num = stages
    return f"""
WITH per_row AS (
  SELECT event_type,
         CAST({n_ip} AS BIGINT) AS n_ip,
         CAST({n_email} AS BIGINT) AS n_email,
         CAST({n_num} AS BIGINT) AS n_num,
         {_MD5.format(e=s)} AS h
  FROM events
)
SELECT event_type,
       count(*) AS n_events,
       CAST(SUM(CASE WHEN n_ip + n_email + n_num > 0 THEN 1 ELSE 0 END) AS BIGINT) AS events_with_pii,
       CAST(SUM(n_ip) AS BIGINT) AS ip_hits,
       CAST(SUM(n_email) AS BIGINT) AS email_hits,
       CAST(SUM(n_num) AS BIGINT) AS num_hits,
       bit_xor(h) AS scrub_xor
FROM per_row
GROUP BY event_type
ORDER BY event_type
"""


# --------------------------------------------------------------------------
# pipe_corpus_build — the END-TO-END corpus build as ONE declarative
# plan: quality filter → language filter → exact dedup (survivor
# selection) → deterministic train/val/test assignment → final census
# with per-cell token totals and an order-insensitive content
# certificate (manifest-style bit_xor of the normalized-text digests).
# This is the composition a user actually ships: because every stage is
# a DataFrame transformation, Catalyst fuses the three filters into the
# scan, the whole thing is ONE corpus read + one dedup shuffle + one
# census rollup — no intermediate materialization between stages. The
# oracle restates all five stages in a single SQL statement.
# --------------------------------------------------------------------------
def pipe_corpus_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jobx_spark.operators.dedup import normalized_digest
    from jobx_spark.operators.text import lang_guess, punct_count, token_count

    docs = load_table(spark, sf_dir, "documents")
    filtered = docs.filter(
        (token_count(F.col("text")) >= MIN_TOKENS)
        & (punct_count(F.col("text")).cast("double") / F.length("text") < MAX_PUNCT_RATIO)
        & (lang_guess(F.col("text")) == "en")
    )
    survivors = (
        filtered.withColumn("digest", normalized_digest("text"))
        .groupBy("digest")
        .agg(
            F.min(F.struct(F.col("doc_id"), F.col("source"), F.col("text"))).alias("k")
        )
        .select(
            F.col("k.doc_id").alias("doc_id"),
            F.col("k.source").alias("source"),
            F.col("k.text").alias("text"),
            "digest",
        )
    )
    gate = md5_long(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))) % 100
    split = (
        F.when(gate < 90, F.lit("train"))
        .when(gate < 95, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        survivors.select(
            split.alias("split"),
            "source",
            token_count(F.col("text")).alias("n_tokens"),
            "digest",
        )
        .groupBy("split", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.bit_xor("digest").alias("content_xor"),
        )
        .orderBy("split", "source")
    )


def _corpus_build_oracle() -> str:
    from jobx_spark.operators.text import LANG_STOPWORDS

    langs = sorted(LANG_STOPWORDS)
    scores = {
        lang: f"len(list_intersect(toks, {LANG_STOPWORDS[lang]!r}))" for lang in langs
    }
    best = "greatest(" + ", ".join(scores.values()) + ")"
    cases = " ".join(
        f"WHEN {scores[lang]} = {best} AND {best} > 0 THEN '{lang}'" for lang in langs
    )
    digest = _MD5.format(e="regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')")
    split_gate = _MD5.format(e="'split:'||CAST(doc_id AS VARCHAR)") + " % 100"
    return f"""
WITH t AS (SELECT doc_id, source, text, {_TOKS} AS toks FROM documents),
f AS (
  SELECT doc_id, source, text, len(toks) AS n_tokens FROM t
  WHERE len(toks) >= {MIN_TOKENS}
    AND length(regexp_replace(text, '[^.,!?;:]', '', 'g'))::DOUBLE / length(text) < {MAX_PUNCT_RATIO}
    AND (CASE {cases} ELSE 'und' END) = 'en'
),
d AS (
  SELECT {digest} AS dg, min(doc_id) AS keep_id FROM f GROUP BY 1
),
s AS (
  SELECT f.doc_id AS doc_id, f.source AS source, f.n_tokens AS n_tokens, d.dg AS digest
  FROM f JOIN d ON f.doc_id = d.keep_id
)
SELECT CASE WHEN {split_gate} < 90 THEN 'train'
            WHEN {split_gate} < 95 THEN 'val'
            ELSE 'test' END AS split,
       source,
       count(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       bit_xor(digest) AS content_xor
FROM s
GROUP BY split, source
ORDER BY split, source
"""


# --------------------------------------------------------------------------
# pipe_encode_ids — tokenizer APPLICATION (the step after vocab
# training): every document's tokens mapped to vocabulary ids (rank by
# count DESC, token ASC; OOV → 0), certified per doc by a positional
# checksum Σ id·position so any id/order slip changes the hash. The
# vocab is vocabulary-sized → broadcast; the exploded (doc, pos, token)
# join is therefore shuffle-free and the only exchange is the per-doc
# rollup — scan-shaped at 100 TB like the tokenizer pass it models.
# --------------------------------------------------------------------------
ENCODE_VOCAB_K = 1000


def pipe_encode_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select(F.explode(tokens(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # TakeOrderedAndProject top-K, id recomputed over ≤K rows (the
    # pipe_vocab_topk device): the vocabulary cut never funnels the
    # full distinct-token table through one empty-partition window task
    order = [F.col("n").desc(), F.col("token")]
    vocab = (
        counts.orderBy(*order).limit(ENCODE_VOCAB_K)
        .withColumn("id", F.row_number().over(W.orderBy(*order)).cast("bigint"))
        .select("token", "id")
    )
    exploded = docs.select(
        "doc_id", F.posexplode(tokens(F.col("text"))).alias("pos", "token")
    )
    encoded = exploded.join(F.broadcast(vocab), "token", "left").select(
        "doc_id",
        (F.col("pos") + 1).cast("bigint").alias("position"),
        F.coalesce(F.col("id"), F.lit(0)).cast("bigint").alias("id"),
    )
    return (
        encoded.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.when(F.col("id") == 0, 1).otherwise(0))
            .cast("bigint")
            .alias("n_oov"),
            F.sum(F.col("id") * F.col("position")).cast("bigint").alias(
                "ids_checksum"
            ),
        )
        .orderBy("doc_id")
    )


ORACLE_PIPE_ENCODE = f"""
WITH tok AS (SELECT unnest({_TOKS}) AS token FROM documents),
c AS (SELECT token, count(*) AS n FROM tok GROUP BY token),
vocab AS (
  SELECT token,
         CAST(row_number() OVER (ORDER BY n DESC, token) AS BIGINT) AS id
  FROM c
  QUALIFY id <= {ENCODE_VOCAB_K}
), pos AS (
  SELECT doc_id, i AS position, toks[i] AS token
  FROM (SELECT doc_id, {_TOKS} AS toks FROM documents),
       LATERAL (SELECT unnest(generate_series(1, len(toks))) AS i)
)
SELECT p.doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(SUM(CASE WHEN v.id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
       CAST(SUM(coalesce(v.id, 0) * p.position) AS BIGINT) AS ids_checksum
FROM pos p LEFT JOIN vocab v ON v.token = p.token
GROUP BY p.doc_id
ORDER BY p.doc_id
"""


# --------------------------------------------------------------------------
# pipe_sample_weighted — size-biased sampling without randomness: each
# document gets priority hash(id)/weight (weight = n_chars + 1, so
# longer documents sort earlier), take the K smallest. The hash plays
# the role of the uniform draw in priority sampling (A-ES family), but
# with INTEGER numerator and denominator the single IEEE division is
# exactly rounded in any engine — deterministic across clusters,
# retries and partitionings, like every sampler here. One TakeOrdered
# (map-side top-K per partition, K merged on the driver) — no full
# sort at 100 TB.
# --------------------------------------------------------------------------
WEIGHTED_K = 200


def pipe_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    h = md5_long(F.concat(F.lit("wsample:"), F.col("doc_id").cast("string")))
    prio = h.cast("double") / (F.col("n_chars") + 1).cast("double")
    return (
        docs.select("doc_id", "lang", "n_chars", prio.alias("priority"))
        .orderBy("priority", "doc_id")
        .limit(WEIGHTED_K)
        .select("doc_id", "lang", "n_chars")
    )


_WPRIO = (
    f"CAST({_MD5.format(e=chr(39) + 'wsample:' + chr(39) + '||CAST(doc_id AS VARCHAR)')} AS DOUBLE)"
    " / CAST(n_chars + 1 AS DOUBLE)"
)
ORACLE_PIPE_SAMPLE_WEIGHTED = f"""
SELECT doc_id, lang, n_chars
FROM documents
ORDER BY {_WPRIO}, doc_id
LIMIT {WEIGHTED_K}
"""


# --------------------------------------------------------------------------
# pipe_bpe_learn — BPE tokenizer TRAINING (not just counting): greedy
# merge learning over the corpus vocabulary. Words start as
# separator-joined character sequences weighted by corpus frequency;
# each round counts adjacent symbol pairs, takes the most frequent
# (count desc, pair asc — total order), and applies the merge as a
# left-to-right non-overlapping string replace on every word. Exactly
# BPE_MERGES rounds (pagerank-style fixed contract) so the oracle is
# the same loop unrolled. The driver sees ONE row per round (the
# argmax pair — bounded by contract); all pair counting happens on the
# frequency-weighted DISTINCT-word table, which is vocabulary-sized,
# not corpus-sized — the reason BPE training scales: 100 TB of text,
# but the vocab table is millions of rows at most, re-paired per
# round.
# --------------------------------------------------------------------------
BPE_MERGES = 3
_BPE_SEP = "\x1f"


def pipe_bpe_learn(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jobx_spark.lineage import cut_lineage

    docs = load_table(spark, sf_dir, "documents")
    wf = (
        docs.select(F.explode(tokens(F.col("text"))).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("n"))
    )
    words = wf.select(
        # NB Spark's two-arg rtrim is (trimStr, str) — reversed from
        # DuckDB's (str, chars); TRIM(TRAILING...) is unambiguous.
        F.expr(
            f"trim(TRAILING '{_BPE_SEP}' FROM"
            f" regexp_replace(w, '(.)', '$1{_BPE_SEP}'))"
        ).alias("sym"),
        "n",
    )
    words = cut_lineage(words, "bpe-w")
    merges = []
    for t in range(1, BPE_MERGES + 1):
        pairs = (
            words.select("n", F.split("sym", _BPE_SEP).alias("a"))
            .filter(F.size("a") >= 2)
            .select(
                "n",
                F.explode(
                    F.expr(
                        "transform(sequence(0, size(a)-2),"
                        " i -> struct(a[i] AS x, a[i+1] AS y))"
                    )
                ).alias("p"),
            )
            .groupBy(F.col("p.x").alias("x"), F.col("p.y").alias("y"))
            .agg(F.sum("n").alias("cnt"))
        )
        rows = pairs.orderBy(F.desc("cnt"), F.asc("x"), F.asc("y")).limit(1).collect()
        if not rows:
            # fully-merged degenerate corpus: no multi-symbol word
            # remains, so no pair exists — stop learning (ADVICE r8;
            # the oracle's LEFT JOIN fallback yields the same truncated
            # merge list)
            break
        best = rows[0]
        merges.append((t, best.x, best.y, int(best.cnt)))
        words = cut_lineage(
            words.select(
                F.replace(
                    F.col("sym"),
                    F.lit(best.x + _BPE_SEP + best.y),
                    F.lit(best.x + best.y),
                ).alias("sym"),
                "n",
            ),
            "bpe-w",
        )
    final_syms = words.agg(
        F.sum(F.col("n") * F.size(F.split("sym", _BPE_SEP))).alias("final_symbols")
    )
    mdf = spark.createDataFrame(
        merges, "rank int, lhs string, rhs string, pair_n bigint"
    )
    return mdf.crossJoin(F.broadcast(final_syms)).orderBy("rank")


def _bpe_learn_oracle() -> str:
    parts = [
        f"""tok AS (SELECT unnest({_TOKS}) AS w FROM documents),
wf AS (SELECT w, CAST(count(*) AS BIGINT) AS n FROM tok GROUP BY w),
w0 AS (
  SELECT rtrim(regexp_replace(w, '(.)', '\\1' || chr(31), 'g'), chr(31)) AS sym, n
  FROM wf
)"""
    ]
    for t in range(1, BPE_MERGES + 1):
        parts.append(f"""p{t} AS (
  SELECT arr[i] AS x, arr[i + 1] AS y, CAST(SUM(n) AS BIGINT) AS cnt
  FROM (SELECT string_split(sym, chr(31)) AS arr, n FROM w{t - 1}) t,
       unnest(generate_series(1, len(arr) - 1)) AS g(i)
  GROUP BY 1, 2
), best{t} AS (
  SELECT x, y, cnt FROM p{t} ORDER BY cnt DESC, x ASC, y ASC LIMIT 1
), w{t} AS (
  -- LEFT JOIN ON TRUE: an empty best{t} (fully-merged corpus) keeps
  -- w{t-1} unchanged instead of emptying the chain (ADVICE r8)
  SELECT COALESCE(replace(sym, x || chr(31) || y, x || y), sym) AS sym, n
  FROM w{t - 1} LEFT JOIN best{t} ON TRUE
)""")
    body = ",\n".join(parts)
    union = "\nUNION ALL\n".join(
        f"SELECT {t} AS rank, x AS lhs, y AS rhs, cnt AS pair_n FROM best{t}"
        for t in range(1, BPE_MERGES + 1)
    )
    return f"""
WITH {body},
merges AS ({union}),
fs AS (
  SELECT CAST(SUM(n * len(string_split(sym, chr(31)))) AS BIGINT)
             AS final_symbols
  FROM w{BPE_MERGES}
)
SELECT CAST(rank AS INTEGER) AS rank, lhs, rhs, pair_n, final_symbols
FROM merges, fs
ORDER BY rank
"""


# --------------------------------------------------------------------------
# pipe_bpe_encode — BPE tokenizer APPLICATION with the LEARNED merges
# (VERDICT r7 #4): pipe_encode_ids maps whole tokens through a vocab,
# so the merges pipe_bpe_learn produces never reached encoding and the
# tokenizer pipeline didn't round-trip. This closes the loop: the
# learn chain re-runs (vocabulary-sized, the attested shape), each
# merge is applied to the DISTINCT-WORD table with the exact replace
# device the learn loop itself uses (left-to-right non-overlapping
# replace on the separator-joined symbol string — encode(word) is BY
# CONSTRUCTION the word's state in the learner), and the final symbol
# vocabulary (|chars| + merge count rows — driver-tiny, the one
# legitimate collect, like the learner's per-round argmax) maps
# symbols to ids (weighted frequency desc, symbol asc).
# Per document: id count, merged-symbol count, and the positional
# checksum Σ (offset+i)·id over the concatenated id stream (the
# pipe_encode_ids certification device) — any id, order, or merge slip
# flips the hash.
# Scale shape: merges + vocab live on the distinct-word table; docs
# encode via ONE word-keyed join (AQE broadcasts the word table when
# small); the offset prefix runs per document (window partition =
# one doc's tokens, bounded by document length — declared).
# --------------------------------------------------------------------------
def _bpe_learned_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The learn-chain distinct-word table (w, sym, n) after BPE_MERGES
    rounds — shared by pipe_bpe_encode and pipe_bpe_decode. The
    per-round best-pair argmax is a 1-row limit(1) collect (bounded,
    same contract as pipe_bpe_learn; declared in collect_contract)."""
    from jobx_spark.lineage import cut_lineage

    docs = load_table(spark, sf_dir, "documents")
    wf = (
        docs.select(F.explode(tokens(F.col("text"))).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("n"))
    )
    words = cut_lineage(
        wf.select(
            "w",
            F.expr(
                f"trim(TRAILING '{_BPE_SEP}' FROM"
                f" regexp_replace(w, '(.)', '$1{_BPE_SEP}'))"
            ).alias("sym"),
            "n",
        ),
        "bpee-w",
    )
    for _t in range(1, BPE_MERGES + 1):
        pairs = (
            words.select("n", F.split("sym", _BPE_SEP).alias("a"))
            .filter(F.size("a") >= 2)
            .select(
                "n",
                F.explode(
                    F.expr(
                        "transform(sequence(0, size(a)-2),"
                        " i -> struct(a[i] AS x, a[i+1] AS y))"
                    )
                ).alias("p"),
            )
            .groupBy(F.col("p.x").alias("x"), F.col("p.y").alias("y"))
            .agg(F.sum("n").alias("cnt"))
        )
        rows = pairs.orderBy(
            F.desc("cnt"), F.asc("x"), F.asc("y")
        ).limit(1).collect()
        if not rows:
            # fully-merged degenerate corpus: keep words unchanged and
            # stop — mirrors the learner and the oracle's LEFT JOIN
            # fallback (ADVICE r8)
            break
        best = rows[0]
        words = cut_lineage(
            words.select(
                "w",
                F.replace(
                    F.col("sym"),
                    F.lit(best.x + _BPE_SEP + best.y),
                    F.lit(best.x + best.y),
                ).alias("sym"),
                "n",
            ),
            "bpee-w",
        )
    return words


def _bpe_symbol_idmap(words: DataFrame) -> dict[str, int]:
    """Symbol vocabulary: weighted frequency desc, symbol asc → id
    (1-based). |chars| + BPE_MERGES rows at most — collect + literal
    map keeps encode/decode join-free per symbol (declared in
    collect_contract)."""
    sym_rows = (
        words.select(F.explode(F.split("sym", _BPE_SEP)).alias("s"), "n")
        .groupBy("s")
        .agg(F.sum("n").alias("cnt"))
        .collect()
    )
    return {
        r["s"]: i + 1
        for i, r in enumerate(
            sorted(sym_rows, key=lambda r: (-r["cnt"], r["s"]))
        )
    }


def pipe_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    words = _bpe_learned_words(spark, sf_dir)
    sym_id = _bpe_symbol_idmap(words)
    return _bpe_encode_body(docs, words, sym_id)


def _bpe_encode_body(
    docs: DataFrame, words: DataFrame, sym_id: dict[str, int]
) -> DataFrame:
    """The encode plan proper, shared by pipe_bpe_encode (learn chain
    in-plan) and pipe_encode_serve (words/ids loaded from the persisted
    vocabulary): per-doc id count, merged-id count and the positional
    checksum, from ONE word-keyed join."""
    from pyspark.sql import Window as W

    id_entries = [x for s, i in sorted(sym_id.items()) for x in (F.lit(s), F.lit(i))]
    idmap = F.create_map(*id_entries)
    word_ids = words.select(
        "w",
        F.transform(F.split("sym", _BPE_SEP), lambda s: idmap[s]).alias("ids"),
        F.transform(
            F.split("sym", _BPE_SEP), lambda s: F.length(s).cast("long")
        ).alias("lens"),
    ).select(
        "w",
        F.size("ids").cast("long").alias("L"),
        F.aggregate(
            "ids", F.lit(0).cast("long"), lambda a, x: a + x
        ).alias("id_sum"),
        # Σ i·id over 1-based local positions
        F.aggregate(
            F.zip_with(
                F.sequence(F.lit(1), F.size("ids")).cast("array<long>"),
                F.col("ids"),
                lambda i, x: i * x,
            ),
            F.lit(0).cast("long"),
            lambda a, x: a + x,
        ).alias("id_wsum"),
        F.size(F.filter("lens", lambda l: l > 1)).cast("long").alias("n_merged"),
    )
    toks = docs.select(
        "doc_id", F.posexplode(tokens(F.col("text"))).alias("tpos", "w")
    )
    enc = toks.join(word_ids, "w")
    off_w = (
        W.partitionBy("doc_id").orderBy("tpos")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    stamped = enc.withColumn(
        "off", F.sum("L").over(off_w) - F.col("L")
    )
    return (
        stamped.groupBy("doc_id")
        .agg(
            F.sum("L").alias("n_ids"),
            F.sum("n_merged").alias("n_merged_ids"),
            F.sum(
                F.col("off") * F.col("id_sum") + F.col("id_wsum")
            ).alias("pos_checksum"),
        )
        .orderBy("doc_id")
    )


def _bpe_chain_parts() -> list[str]:
    """The shared encode-side learn-chain CTEs (tok → wf → e0 → … →
    e{BPE_MERGES}) used by both the encode and decode oracles."""
    parts = [
        f"""tok AS (SELECT unnest({_TOKS}) AS w FROM documents),
wf AS (SELECT w, CAST(count(*) AS BIGINT) AS n FROM tok GROUP BY w),
e0 AS MATERIALIZED (
  SELECT w,
         rtrim(regexp_replace(w, '(.)', '\\1' || chr(31), 'g'), chr(31)) AS sym,
         n
  FROM wf
)"""
    ]
    for t in range(1, BPE_MERGES + 1):
        parts.append(f"""ep{t} AS (
  SELECT arr[i] AS x, arr[i + 1] AS y, CAST(SUM(n) AS BIGINT) AS cnt
  FROM (SELECT string_split(sym, chr(31)) AS arr, n FROM e{t - 1}) t,
       unnest(generate_series(1, len(arr) - 1)) AS g(i)
  GROUP BY 1, 2
), eb{t} AS (
  SELECT x, y FROM ep{t} ORDER BY cnt DESC, x ASC, y ASC LIMIT 1
), e{t} AS MATERIALIZED (
  -- LEFT JOIN ON TRUE: an empty eb{t} (fully-merged corpus) keeps
  -- e{t-1} unchanged instead of emptying the chain (ADVICE r8)
  SELECT w, COALESCE(replace(sym, x || chr(31) || y, x || y), sym) AS sym, n
  FROM e{t - 1} LEFT JOIN eb{t} ON TRUE
)""")
    return parts


def _bpe_encode_oracle() -> str:
    n = BPE_MERGES
    body = ",\n".join(_bpe_chain_parts())
    return f"""
WITH {body},
symv AS (
  SELECT s, CAST(SUM(n) AS BIGINT) AS cnt
  FROM (SELECT unnest(string_split(sym, chr(31))) AS s, n FROM e{n})
  GROUP BY s
),
ids AS MATERIALIZED (
  SELECT s, CAST(row_number() OVER (ORDER BY cnt DESC, s ASC) AS BIGINT) AS id
  FROM symv
),
wid AS MATERIALIZED (
  SELECT w,
         CAST(count(*) AS BIGINT) AS L,
         CAST(SUM(id) AS BIGINT) AS id_sum,
         CAST(SUM(i * id) AS BIGINT) AS id_wsum,
         CAST(SUM(CASE WHEN length(js.s) > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_merged
  FROM (
    SELECT w, g.i AS i, syms[g.i] AS s
    FROM (SELECT w, string_split(sym, chr(31)) AS syms FROM e{n}) t,
         unnest(generate_series(1, len(syms))) AS g(i)
  ) js JOIN ids ON ids.s = js.s
  GROUP BY w
),
dt AS (
  SELECT doc_id, g.i AS tpos, toks[g.i] AS w
  FROM (SELECT doc_id, {_TOKS} AS toks FROM documents) d,
       unnest(generate_series(1, len(toks))) AS g(i)
),
st AS (
  SELECT doc_id, wid.L, wid.id_sum, wid.id_wsum, wid.n_merged,
         SUM(wid.L) OVER (PARTITION BY doc_id ORDER BY tpos
                          ROWS UNBOUNDED PRECEDING) - wid.L AS off
  FROM dt JOIN wid ON wid.w = dt.w
)
SELECT doc_id,
       CAST(SUM(L) AS BIGINT) AS n_ids,
       CAST(SUM(n_merged) AS BIGINT) AS n_merged_ids,
       CAST(SUM(off * id_sum + id_wsum) AS BIGINT) AS pos_checksum
FROM st GROUP BY doc_id
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# pipe_bpe_decode — BPE DECODE round-trip certificate (VERDICT r8
# headroom #1): pipe_bpe_encode proves encode(word) equals the
# learner's state; nothing yet certified that the ID STREAM decodes
# back to the original text. This closes the tokenizer loop: each
# word's symbols map to ids (the encode direction) and IMMEDIATELY
# back through the broadcast inverse id→symbol map; the decoded
# concatenation is string-compared to the source word. Per document:
# token count, id count, count of round-tripping tokens, a 0/1
# round_trip flag (all tokens decoded exactly), and the decoded
# character total — all integers, oracle-recomputed, so any id
# collision, inversion slip, or order scramble flips the hash. The
# oracle goes through ITS ids table twice (ids.s = js.s, then
# inv.id = ids.id) — the same two hops the Spark literal maps take.
# Scale shape: identical to pipe_bpe_encode — the chain lives on the
# distinct-word table, the id/inverse maps are |chars|+merges-row
# literals, docs certify via ONE word-keyed join; no window at all
# (per-token equality at every position certifies the whole
# reconstruction, so no offset prefix sum is needed).
# --------------------------------------------------------------------------
def pipe_bpe_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    words = _bpe_learned_words(spark, sf_dir)
    sym_id = _bpe_symbol_idmap(words)
    id_entries = [x for s, i in sorted(sym_id.items()) for x in (F.lit(s), F.lit(i))]
    idmap = F.create_map(*id_entries)
    inv_entries = [x for s, i in sorted(sym_id.items()) for x in (F.lit(i), F.lit(s))]
    invmap = F.create_map(*inv_entries)
    word_dec = words.select(
        "w", F.split("sym", _BPE_SEP).alias("syms")
    ).select(
        "w",
        F.size("syms").cast("long").alias("L"),
        # the round trip: symbol → id → symbol, concatenated in order
        F.concat_ws(
            "",
            F.transform(
                F.transform("syms", lambda s: idmap[s]),
                lambda i: invmap[i],
            ),
        ).alias("decoded"),
    )
    toks = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("w"))
    joined = toks.join(word_dec, "w")
    agg = joined.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum("L").alias("n_ids"),
        F.sum((F.col("decoded") == F.col("w")).cast("long")).alias(
            "n_match_tokens"
        ),
        F.sum(F.length("decoded").cast("long")).alias("decoded_chars"),
    )
    return (
        agg.select(
            "doc_id",
            "n_tokens",
            "n_ids",
            "n_match_tokens",
            (F.col("n_match_tokens") == F.col("n_tokens"))
            .cast("long")
            .alias("round_trip"),
            "decoded_chars",
        )
        .orderBy("doc_id")
    )


def _bpe_decode_oracle() -> str:
    n = BPE_MERGES
    body = ",\n".join(_bpe_chain_parts())
    return f"""
WITH {body},
symv AS (
  SELECT s, CAST(SUM(n) AS BIGINT) AS cnt
  FROM (SELECT unnest(string_split(sym, chr(31))) AS s, n FROM e{n})
  GROUP BY s
),
ids AS MATERIALIZED (
  SELECT s, CAST(row_number() OVER (ORDER BY cnt DESC, s ASC) AS BIGINT) AS id
  FROM symv
),
wdec AS MATERIALIZED (
  SELECT w,
         CAST(count(*) AS BIGINT) AS L,
         string_agg(inv.s, '' ORDER BY js.i) AS decoded
  FROM (
    SELECT w, g.i AS i, syms[g.i] AS s
    FROM (SELECT w, string_split(sym, chr(31)) AS syms FROM e{n}) t,
         unnest(generate_series(1, len(syms))) AS g(i)
  ) js JOIN ids ON ids.s = js.s
       JOIN ids inv ON inv.id = ids.id
  GROUP BY w
),
dt AS (
  SELECT doc_id, g.i AS tpos, toks[g.i] AS w
  FROM (SELECT doc_id, {_TOKS} AS toks FROM documents) d,
       unnest(generate_series(1, len(toks))) AS g(i)
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(SUM(wdec.L) AS BIGINT) AS n_ids,
       CAST(SUM(CASE WHEN wdec.decoded = dt.w THEN 1 ELSE 0 END) AS BIGINT)
           AS n_match_tokens,
       CAST(CASE WHEN SUM(CASE WHEN wdec.decoded = dt.w THEN 1 ELSE 0 END)
                      = count(*)
                 THEN 1 ELSE 0 END AS BIGINT) AS round_trip,
       CAST(SUM(length(wdec.decoded)) AS BIGINT) AS decoded_chars
FROM dt JOIN wdec ON wdec.w = dt.w
GROUP BY doc_id
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# pipe_shard_assign — the training-data "shuffle": every document gets
# a shard (hash-bucket) and a deterministic pseudo-random position
# within its shard (rank of an independent content hash). Together
# they define the epoch-stable global visit order SGD training wants —
# reproducible across clusters/retries, no RNG, no driver state.
# Scale shape (VERDICT r7 #1-family — N_SHARDS is fixed, so a naive
# per-shard row_number puts corpus/shards rows in ONE window task): the
# within-shard rank decomposes over the position hash's top bits —
# bucket = pos_h div 2⁵⁰ (1024 buckets, disjoint ordered hash ranges),
# rank = Σ counts of earlier buckets (a carry cumsum along the
# ≤ shards·1024-row census) + rank WITHIN the (shard, bucket) window
# (corpus/(shards·1024) rows — the same 1024× compression as the
# stratified sampler's pre-filter). At 100 TB each shard is written as
# its own partition and pos is the within-file sort key.
# --------------------------------------------------------------------------
N_SHARDS = 8
_SHARD_POS_BDIV = (1 << 60) // 1024


def pipe_shard_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    shard = F.pmod(
        md5_long(F.concat(F.lit("shard:"), F.col("doc_id").cast("string"))),
        F.lit(N_SHARDS),
    )
    pos_h = md5_long(F.concat(F.lit("pos:"), F.col("doc_id").cast("string")))
    base = docs.select(
        "doc_id", shard.alias("shard"), pos_h.alias("pos_h")
    ).withColumn("b", F.expr(f"pos_h div {_SHARD_POS_BDIV}"))
    carry = (
        base.groupBy("shard", "b")
        .agg(F.count(F.lit(1)).alias("c"))
        .select(
            "shard", "b",
            (
                F.sum("c").over(
                    W.partitionBy("shard").orderBy("b")
                    .rowsBetween(W.unboundedPreceding, W.currentRow)
                )
                - F.col("c")
            ).alias("before"),
        )
    )
    rn_in = F.row_number().over(
        W.partitionBy("shard", "b").orderBy(F.col("pos_h"), F.col("doc_id"))
    )
    return (
        base.join(F.broadcast(carry), ["shard", "b"])
        .withColumn("pos", (F.col("before") + rn_in).cast("bigint"))
        .select("doc_id", "shard", "pos")
        .orderBy("shard", "pos")
    )


_SHARD_H = _MD5.format(e="'shard:'||CAST(doc_id AS VARCHAR)")
_POS_H = _MD5.format(e="'pos:'||CAST(doc_id AS VARCHAR)")
ORACLE_PIPE_SHARD_ASSIGN = f"""
SELECT doc_id, {_SHARD_H} % {N_SHARDS} AS shard,
       CAST(row_number() OVER (PARTITION BY {_SHARD_H} % {N_SHARDS}
            ORDER BY {_POS_H}, doc_id) AS BIGINT) AS pos
FROM documents
ORDER BY shard, pos
"""


# --------------------------------------------------------------------------
# pipe_pack_sequences — sequence packing (VERDICT r5 #5): greedy
# next-fit token-budget packing of documents into fixed context
# windows — the step between tokenization and training that every LLM
# pipeline runs. Docs are concatenated into the current window until
# the next one would overflow PACK_BUDGET, then a new window starts
# (next-fit: no doc splits, no lookback into earlier windows — the
# variant whose greedy fold is a pure left-to-right recurrence, which
# is what makes it BOTH shard-parallel and oracle-expressible; DuckDB
# replays the identical fold as a recursive CTE). Docs longer than the
# budget truncate to exactly one full window.
# Deterministic: docs are hash-ordered within hash-assigned shards
# (pipe_shard_assign's exact layout — same salts, so the pack output
# composes with the shard manifest), never rand()-shuffled — retries,
# partitionings and engines all agree.
# Scale shape: packing is sequential only WITHIN a shard; shards are
# the parallelism unit and N_SHARDS grows with the corpus, so each
# pandas group holds docs/shard 4-int64 rows (a 3B-doc corpus at 1024
# shards ≈ 3M rows ≈ 100 MB — bounded by layout, not corpus). Output
# is the fill-rate census (≤ ~101 rows at any scale), never
# per-window rows.
# --------------------------------------------------------------------------
PACK_BUDGET = 512


def pipe_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    docs = load_table(spark, sf_dir, "documents")
    shard = F.pmod(
        md5_long(F.concat(F.lit("shard:"), F.col("doc_id").cast("string"))),
        F.lit(N_SHARDS),
    )
    pos_h = md5_long(F.concat(F.lit("pos:"), F.col("doc_id").cast("string")))
    tlen = F.least(
        F.size(tokens(F.col("text"))).cast("long"), F.lit(PACK_BUDGET)
    )
    base = docs.select(
        "doc_id", shard.alias("shard"), pos_h.alias("pos_h"),
        tlen.alias("tok_len"),
    )

    def pack(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(["pos_h", "doc_id"])
        wins: list[list[int]] = []  # [win, n_docs, fill]
        for t in pdf["tok_len"].tolist():
            t = int(t)
            if wins and wins[-1][2] + t <= PACK_BUDGET:
                wins[-1][1] += 1
                wins[-1][2] += t
            else:
                wins.append([len(wins), 1, t])
        return pd.DataFrame(
            {
                "shard": [int(pdf["shard"].iloc[0])] * len(wins),
                "win": [w[0] for w in wins],
                "n_docs": [w[1] for w in wins],
                "fill_tokens": [w[2] for w in wins],
            }
        )

    wins = base.groupBy("shard").applyInPandas(
        pack, "shard long, win long, n_docs long, fill_tokens long"
    )
    return (
        wins.groupBy(
            F.expr(f"(fill_tokens * 100) div {PACK_BUDGET}").alias("fill_pct")
        )
        .agg(
            F.count("*").alias("n_windows"),
            F.sum("n_docs").alias("n_docs"),
            F.sum("fill_tokens").alias("total_tokens"),
        )
        .orderBy("fill_pct")
    )


_PACK_SHARD = _MD5.format(e="'shard:'||CAST(doc_id AS VARCHAR)")
_PACK_POS = _MD5.format(e="'pos:'||CAST(doc_id AS VARCHAR)")
ORACLE_PIPE_PACK_SEQUENCES = f"""
WITH RECURSIVE t AS (
  SELECT shard,
         row_number() OVER (PARTITION BY shard ORDER BY pos_h, doc_id) AS rn,
         tok_len
  FROM (
    SELECT doc_id,
           {_PACK_SHARD} % {N_SHARDS} AS shard,
           {_PACK_POS} AS pos_h,
           least(len({_TOKS}), {PACK_BUDGET}) AS tok_len
    FROM documents)
),
steps AS (
  SELECT shard, rn, tok_len, tok_len AS fill, 0 AS win FROM t WHERE rn = 1
  UNION ALL
  SELECT t.shard, t.rn, t.tok_len,
         CASE WHEN s.fill + t.tok_len <= {PACK_BUDGET}
              THEN s.fill + t.tok_len ELSE t.tok_len END,
         CASE WHEN s.fill + t.tok_len <= {PACK_BUDGET}
              THEN s.win ELSE s.win + 1 END
  FROM steps s JOIN t ON t.shard = s.shard AND t.rn = s.rn + 1
),
wins AS (
  SELECT shard, win, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(max(fill) AS BIGINT) AS fill_tokens
  FROM steps GROUP BY shard, win
)
SELECT CAST((fill_tokens * 100) // {PACK_BUDGET} AS BIGINT) AS fill_pct,
       CAST(count(*) AS BIGINT) AS n_windows,
       CAST(SUM(n_docs) AS BIGINT) AS n_docs,
       CAST(SUM(fill_tokens) AS BIGINT) AS total_tokens
FROM wins GROUP BY 1
ORDER BY fill_pct
"""


# --------------------------------------------------------------------------
# pipe_dsir_sample — DSIR-style importance resampling (Xie et al. 2023,
# "Data Selection for Language Models via Importance Resampling",
# VERDICT r5 #6): corpus documents are re-weighted toward a target
# domain by HASHED N-GRAM features — each doc's unigrams+bigrams hash
# into DSIR_NB buckets, the target sample (here source='src0', the
# held-out domain) and the raw corpus each yield a bucket profile, and
# a doc's importance is its mean per-gram likelihood ratio
# (target+1)/(corpus+1), Laplace-smoothed. Selection is HASH-GATED
# acceptance ∝ weight (accept iff h(doc) mod TAU < mean ratio) — the
# same rand()-free gate every sampler here uses, so the resample is
# retry/partition-deterministic and exactly oracle-checkable.
# Integer-exactness: ratios are scaled-integer floor divisions
# (r_s = (p+1)·K div (q+1)); the target is a subset of the corpus so
# p ≤ q and r_s ≤ K — per-doc sums stay far inside int64 at any
# corpus size.
# Scale shape (the verdict's prescription, tightened r12): ONE
# explode pass collapses to the (doc, bucket, n) occurrence table
# (≤256 rows/doc, map-side combinable) and materializes; the bucket
# census and the ratio profile re-aggregate IT (256 rows, broadcast
# back), and per-doc scoring is a broadcast join + Σ r_s·n
# re-aggregate of the same table — no second explode, no doc-keyed
# join of corpus rows. 100 TB cost: 1 corpus scan + one
# occurrence-table round-trip (≈ gram-count rows of 3 small ints,
# zstd-friendly) + ~22 rows out.
# --------------------------------------------------------------------------
DSIR_NB = 256
DSIR_K = 1 << 20
DSIR_TAU = 2 * DSIR_K  # mean ratio ≥ 2 ⇒ always accepted
DSIR_TARGET = "src0"


def _dsir_grams(text_col) -> "F.Column":
    from jobx_spark.operators.text import shingles

    return F.concat(tokens(text_col), shingles(text_col, 2))


def pipe_dsir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jobx_spark.lineage import cut_lineage

    docs = load_table(spark, sf_dir, "documents")
    bucket_of = lambda c: F.pmod(  # noqa: E731
        md5_long(F.concat(F.lit("dsir:"), c)), F.lit(DSIR_NB)
    )
    # ONE explode+md5 pass for census AND scoring (guide §1.2-1; the
    # r10 fuse took 3 documents scans to 2, this takes 2 to 1): the
    # exploded gram frame collapses to the (doc_id, source, bucket,
    # n)-compact occurrence table — ≤256 rows per doc, map-side
    # combinable — which materializes once and feeds both the
    # bucket census (Σn re-aggregate) and the per-doc scoring
    # (Σ r_s·n ≡ per-occurrence Σ r_s, exact int64). The gram-less
    # NULL-text filter moves up front: explode of NULL produced no
    # census rows before either, so census values are unchanged.
    # Arrow gram producer: one fused pass emits the md5("dsir:"+gram)
    # hash for the unigram+bigram multiset (ns=(1,2) ≡ concat(tokens,
    # shingles-2)); bucketing is a pmod of that hash — bit-identical to
    # the old explode + codegen md5 and free of the interpreted
    # shingle lambda
    from jobx_spark.operators.text import gram_rows

    gcounts = cut_lineage(
        gram_rows(
            docs.filter(F.col("text").isNotNull()),
            ["doc_id", "source"], "text",
            ns=(1, 2), distinct=False, prefix="dsir:",
        )
        .select("doc_id", "source", F.pmod(F.col("h"), F.lit(DSIR_NB)).alias("b"))
        .groupBy("doc_id", "source", "b")
        .agg(F.count(F.lit(1)).alias("n")),
        "dsir-gcounts",
    )
    census = gcounts.groupBy("b").agg(
        F.sum("n").alias("q"),
        F.sum(F.when(F.col("source") == DSIR_TARGET, F.col("n")).otherwise(F.lit(0))).alias("p"),
    )
    dom = spark.range(DSIR_NB).select(F.col("id").alias("b"))
    ratio = (
        dom.join(census, "b", "left")
        .select(
            "b",
            F.expr(
                f"((coalesce(p, 0) + 1) * {DSIR_K})"
                f" div (coalesce(q, 0) + 1)"
            ).alias("r_s"),
        )
    )
    # Contract: documents that produce NO gram rows are DROPPED before
    # scoring — the oracle derives its per-doc table from the exploded
    # gram table, so such a doc never appears there [ADVICE r6]. For
    # any NON-NULL text, split() yields ≥1 element (tokens('') is ['']
    # in both engines, and unnest of [''] yields a row), so the only
    # zero-gram case is NULL text: the IsNotNull filter ahead of the
    # gcounts explode (pushed to the scan) handles it.
    #
    # Scoring re-aggregates the compact occurrence table (guide §4.1:
    # codegen md5 at the single explode, never an interpreted
    # higher-order lambda): broadcast join against the DSIR_NB-row
    # ratio table + one map-side-combinable (doc_id, source)
    # aggregate. Σ r_s·n over distinct (doc, bucket) rows equals the
    # per-occurrence Σ r_s exactly (int64), and every bucket
    # 0..DSIR_NB-1 exists in `ratio` by construction (left join
    # against the dom spine), so the inner join drops nothing.
    scored = (
        gcounts.join(F.broadcast(ratio), "b")
        .groupBy("doc_id", "source")
        .agg(
            F.sum("n").alias("n_grams"),
            F.sum(F.col("r_s") * F.col("n")).alias("score_s"),
        )
        .select(
            "doc_id", "source", "n_grams",
            F.expr("score_s div n_grams").alias("mean_s"),
        )
    )
    acc = F.pmod(
        md5_long(F.concat(F.lit("dsiracc:"), F.col("doc_id").cast("string"))),
        F.lit(DSIR_TAU),
    ) < F.col("mean_s")
    return (
        scored.withColumn("accepted", acc.cast("int"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("accepted").alias("n_accepted"),
            F.sum("mean_s").alias("sum_w_s"),
        )
        .select(
            "source", "n_docs", "n_accepted", "sum_w_s",
            F.expr(f"(n_accepted * {10**6}) div n_docs").alias("accept_ppm"),
        )
        .orderBy("source")
    )


_BIGRAMS2 = (
    f"list_transform(generate_series(1, greatest(len({_TOKS})-1, 0)),"
    f" i -> array_to_string(list_slice({_TOKS}, i, i+1), ' '))"
)
_DSIR_H = _MD5.format(e="'dsir:'||gram")
_DSIR_B = f"({_DSIR_H}) % {DSIR_NB}"
_DSIR_ACC = _MD5.format(e="'dsiracc:'||CAST(doc_id AS VARCHAR)")
ORACLE_PIPE_DSIR_SAMPLE = f"""
WITH g AS (
  SELECT doc_id, source, unnest(list_concat({_TOKS}, {_BIGRAMS2})) AS gram
  FROM documents
),
gb AS (SELECT doc_id, source, {_DSIR_B} AS b FROM g),
census AS (
  SELECT b, CAST(count(*) AS BIGINT) AS q,
         CAST(count(*) FILTER (source = '{DSIR_TARGET}') AS BIGINT) AS p
  FROM gb GROUP BY b
),
dom AS (SELECT range AS b FROM range({DSIR_NB})),
r AS (
  SELECT dom.b,
         ((coalesce(c.p, 0) + 1) * {DSIR_K}) // (coalesce(c.q, 0) + 1) AS r_s
  FROM dom LEFT JOIN census c ON c.b = dom.b
),
ds AS (
  SELECT gb.doc_id, gb.source, CAST(count(*) AS BIGINT) AS n_grams,
         CAST(SUM(r.r_s) AS BIGINT) AS score_s
  FROM gb JOIN r ON r.b = gb.b
  GROUP BY gb.doc_id, gb.source
),
scored AS (
  SELECT doc_id, source, n_grams, score_s // n_grams AS mean_s,
         CASE WHEN ({_DSIR_ACC}) % {DSIR_TAU} < score_s // n_grams
              THEN 1 ELSE 0 END AS accepted
  FROM ds
)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(SUM(accepted) AS BIGINT) AS n_accepted,
       CAST(SUM(mean_s) AS BIGINT) AS sum_w_s,
       (CAST(SUM(accepted) AS BIGINT) * {10**6})
           // CAST(count(*) AS BIGINT) AS accept_ppm
FROM scored GROUP BY source
ORDER BY source
"""


# --------------------------------------------------------------------------
# pipe_k_anonymity — k-anonymity census over quasi-identifiers: group
# records by the QI tuple (nation, market segment, account-balance
# band), measure every equivalence-class size k, and report the class/
# row distribution across k bands — the re-identification-risk audit a
# dataset release runs before shipping records that are "anonymous"
# only until someone joins three harmless-looking columns (Sweeney
# 2002). k=1 rows are unique individuals; the k<5 mass is what a
# governance gate bounds.
# Scale shape: two map-side-combinable aggregations (records → QI
# classes → k-band census) — the first shuffle is QI-cardinality-
# bounded, the second is ~5 rows. The balance band uses floor(x/1000)
# on the SAME IEEE double op both engines run, so banding is exact.
# --------------------------------------------------------------------------
K_ANON_BANDS = [(1, 1), (2, 4), (5, 9), (10, 49), (50, None)]


def pipe_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    qi = cust.select(
        F.col("c_nationkey").alias("nation"),
        F.col("c_mktsegment").alias("segment"),
        F.floor(F.col("c_acctbal") / F.lit(1000.0)).cast("long").alias("band"),
    )
    classes = qi.groupBy("nation", "segment", "band").agg(
        F.count(F.lit(1)).alias("k")
    )
    band_lo = (
        F.when(F.col("k") >= 50, F.lit(50))
        .when(F.col("k") >= 10, F.lit(10))
        .when(F.col("k") >= 5, F.lit(5))
        .when(F.col("k") >= 2, F.lit(2))
        .otherwise(F.lit(1))
    )
    return (
        classes.select(band_lo.cast("long").alias("k_band"), "k")
        .groupBy("k_band")
        .agg(
            F.count(F.lit(1)).alias("n_classes"),
            F.sum("k").alias("n_rows"),
        )
        .orderBy("k_band")
    )


ORACLE_PIPE_K_ANONYMITY = """
WITH classes AS (
  SELECT c_nationkey, c_mktsegment,
         CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS band,
         CAST(count(*) AS BIGINT) AS k
  FROM customer GROUP BY 1, 2, 3
)
SELECT CASE WHEN k >= 50 THEN 50 WHEN k >= 10 THEN 10
            WHEN k >= 5 THEN 5 WHEN k >= 2 THEN 2 ELSE 1 END AS k_band,
       CAST(count(*) AS BIGINT) AS n_classes,
       CAST(SUM(k) AS BIGINT) AS n_rows
FROM classes GROUP BY 1
ORDER BY k_band
"""


# --------------------------------------------------------------------------
# pipe_l_diversity — l-diversity census, the companion audit to
# k-anonymity (Machanavajjhala et al. 2006): k-anonymity alone fails
# when every record in an equivalence class shares the SAME sensitive
# value (the homogeneity attack — the class is large, yet the
# attacker learns the secret). Here the QI is (nation, balance band)
# and the sensitive attribute is the market segment: per QI class,
# l = count of DISTINCT sensitive values; the readout is the class/row
# distribution per l, plus each l-level's minimum class size (a row
# with l=1 and any k is a leaking class regardless of k).
# Scale shape: one scan → distinct-combining aggregation keyed by the
# QI tuple (count + count_distinct over a 5-value attribute), then a
# ~|segments|-row census — both shuffles QI-cardinality-bounded, never
# corpus-sized.
# --------------------------------------------------------------------------
def pipe_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    qi = cust.select(
        F.col("c_nationkey").alias("nation"),
        F.floor(F.col("c_acctbal") / F.lit(1000.0)).cast("long").alias("band"),
        F.col("c_mktsegment").alias("sensitive"),
    )
    classes = qi.groupBy("nation", "band").agg(
        F.count(F.lit(1)).alias("k"),
        F.count_distinct("sensitive").alias("l"),
    )
    return (
        classes.groupBy("l")
        .agg(
            F.count(F.lit(1)).alias("n_classes"),
            F.sum("k").alias("n_rows"),
            F.min("k").alias("min_k"),
        )
        .orderBy("l")
    )


ORACLE_PIPE_L_DIVERSITY = """
WITH classes AS (
  SELECT c_nationkey,
         CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS band,
         CAST(count(*) AS BIGINT) AS k,
         CAST(count(DISTINCT c_mktsegment) AS BIGINT) AS l
  FROM customer GROUP BY 1, 2
)
SELECT l, CAST(count(*) AS BIGINT) AS n_classes,
       CAST(SUM(k) AS BIGINT) AS n_rows,
       CAST(MIN(k) AS BIGINT) AS min_k
FROM classes GROUP BY l
ORDER BY l
"""


# --------------------------------------------------------------------------
# pipe_t_closeness — t-closeness audit (Li/Li/Venkatasubramanian 2007),
# extending the k-anonymity / l-diversity pair: l-diversity only counts
# DISTINCT sensitive values per equivalence class, so a class that is
# 99% one segment still passes l=2 — t-closeness instead measures how
# far each class's sensitive-value DISTRIBUTION sits from the global
# one. Distance here is total variation (the categorical-attribute EMD
# with unit ground distance): tvd_ppm = Σ_s |p_class(s) − p_global(s)|
# div 2, with both shares pre-floored to integer ppm so every value is
# exact int64 at ANY row count (the share-then-diff order avoids the
# cnt·N cross-products that overflow at 10¹⁰ rows). The readout bands
# classes by tvd — the t a release can claim is the max band's edge.
# Scale shape: three map-side-combinable aggregations (class×segment,
# class, global) over QI-bounded keys; the dense class×segment grid,
# the diff and the banding are all |classes|·|segments| rows —
# driver-tiny; the corpus is scanned once.
# --------------------------------------------------------------------------
TCL_BAND = 100_000  # ppm per band: 10 bands across [0, 1]


def pipe_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jobx_spark.lineage import cut_lineage

    cust = load_table(spark, sf_dir, "customer")
    qi = cust.select(
        F.col("c_nationkey").alias("nation"),
        F.floor(F.col("c_acctbal") / F.lit(1000.0)).cast("long").alias("band"),
        F.col("c_mktsegment").alias("sensitive"),
    )
    # ONE table scan: class totals, global distribution and N all
    # re-aggregate the QI-bounded (nation, band, sensitive) count
    # table rather than re-scanning the source (r7 PLANS.md caught the
    # 4-scan shape of deriving each from `qi` directly)
    cs = cut_lineage(
        qi.groupBy("nation", "band", "sensitive").agg(
            F.count(F.lit(1)).alias("c")
        ),
        "tclose-cs",
    )
    cls = cs.groupBy("nation", "band").agg(F.sum("c").alias("k"))
    g = cs.groupBy("sensitive").agg(F.sum("c").alias("gc"))
    n = cs.select(F.sum("c").alias("n"))
    gp = g.crossJoin(F.broadcast(n)).select(
        "sensitive", F.expr("gc * 1000000 div n").alias("g_ppm")
    )
    dense = cls.crossJoin(F.broadcast(gp))
    diff = (
        dense.join(cs, ["nation", "band", "sensitive"], "left")
        .select(
            "nation", "band", "k", "g_ppm",
            F.expr("coalesce(c, 0) * 1000000 div k").alias("p_ppm"),
        )
        .groupBy("nation", "band", "k")
        .agg(
            F.expr("sum(abs(p_ppm - g_ppm)) div 2").alias("tvd_ppm")
        )
    )
    return (
        diff.groupBy(F.expr(f"tvd_ppm div {TCL_BAND}").alias("tvd_band"))
        .agg(
            F.count(F.lit(1)).alias("n_classes"),
            F.sum("k").alias("n_rows"),
            F.min("tvd_ppm").alias("min_tvd_ppm"),
            F.max("tvd_ppm").alias("max_tvd_ppm"),
        )
        .orderBy("tvd_band")
    )


ORACLE_PIPE_T_CLOSENESS = f"""
WITH qi AS (
  SELECT c_nationkey AS nation,
         CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS band,
         c_mktsegment AS sensitive
  FROM customer
),
cs AS (SELECT nation, band, sensitive, CAST(count(*) AS BIGINT) AS c
       FROM qi GROUP BY 1, 2, 3),
cls AS (SELECT nation, band, CAST(count(*) AS BIGINT) AS k
        FROM qi GROUP BY 1, 2),
gp AS (
  SELECT sensitive,
         CAST(count(*) AS BIGINT) * 1000000
           // (SELECT CAST(count(*) AS BIGINT) FROM qi) AS g_ppm
  FROM qi GROUP BY sensitive
),
diff AS (
  SELECT cls.nation, cls.band, cls.k,
         CAST(SUM(abs(coalesce(cs.c, 0) * 1000000 // cls.k - gp.g_ppm))
              // 2 AS BIGINT) AS tvd_ppm
  FROM cls CROSS JOIN gp
  LEFT JOIN cs ON cs.nation = cls.nation AND cs.band = cls.band
              AND cs.sensitive = gp.sensitive
  GROUP BY 1, 2, 3
)
SELECT tvd_ppm // {TCL_BAND} AS tvd_band,
       CAST(count(*) AS BIGINT) AS n_classes,
       CAST(SUM(k) AS BIGINT) AS n_rows,
       CAST(MIN(tvd_ppm) AS BIGINT) AS min_tvd_ppm,
       CAST(MAX(tvd_ppm) AS BIGINT) AS max_tvd_ppm
FROM diff GROUP BY 1
ORDER BY tvd_band
"""


# --------------------------------------------------------------------------
# pipe_dp_release — differentially-private count release, completing
# the governance trio (k-anonymity, l-diversity, DP): per-cell counts
# over (nation, segment) are released with additive noise from the
# truncated two-sided geometric mechanism (the discrete Laplace of
# Ghosh/Roughgarden/Sundararajan 2009, truncated at ±DP_TRUNC), the
# standard mechanism for integer count queries. The noise is sampled
# by INVERSE CDF over a deterministic per-cell hash draw: Python
# precomputes the cumulative thresholds of the truncated distribution
# ONCE as integer literals on a 2^40 grid, and both engines compare
# the same 40-bit hash against the same literals — so the "random"
# mechanism is exactly replayable cross-engine (the rand()-free gate
# device again; a production run would key the draw by a secret salt).
# Scale shape: one map-side-combinable aggregation to QI-cardinality-
# bounded cells, then scan-side CASE arithmetic on each cell row; the
# released table is |cells| rows. Released = max(count + noise, 0) —
# the true count never leaves the operator.
# --------------------------------------------------------------------------
DP_EPS = 1.0
DP_TRUNC = 8  # noise support: [-8, +8]
_DP_GRID = 1 << 40


def _dp_thresholds() -> list[int]:
    """Cumulative inverse-CDF thresholds of the truncated two-sided
    geometric: P(k) ∝ alpha^|k|, alpha = exp(-DP_EPS), k in
    [-DP_TRUNC, DP_TRUNC], discretized onto a 2^40 hash grid. The
    floats only exist here, at module load — both engines see the
    same integer literals."""
    import math

    alpha = math.exp(-DP_EPS)
    ks = list(range(-DP_TRUNC, DP_TRUNC + 1))
    weights = [alpha ** abs(k) for k in ks]
    total = sum(weights)
    acc, out = 0.0, []
    for w in weights[:-1]:  # last bucket absorbs the remainder
        acc += w
        out.append(int(acc / total * _DP_GRID))
    return out


DP_THRESHOLDS = _dp_thresholds()


def pipe_dp_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    cells = cust.groupBy(
        F.col("c_nationkey").alias("nation"),
        F.col("c_mktsegment").alias("segment"),
    ).agg(F.count(F.lit(1)).alias("true_n"))
    draw = F.pmod(
        md5_long(
            F.concat(
                F.lit("dp:"),
                F.col("nation").cast("string"),
                F.lit("|"),
                F.col("segment"),
            )
        ),
        F.lit(_DP_GRID),
    )
    # first-match-wins CASE: built innermost-last so the SMALLEST
    # matching threshold decides, mirroring the SQL CASE order
    noise = F.lit(DP_TRUNC)  # fell past every threshold → last bucket
    for i in range(len(DP_THRESHOLDS) - 1, -1, -1):
        noise = F.when(
            draw < F.lit(DP_THRESHOLDS[i]), F.lit(i - DP_TRUNC)
        ).otherwise(noise)
    released = F.greatest(F.col("true_n") + noise, F.lit(0)).cast("long")
    return cells.select(
        "nation", "segment", released.alias("released_n")
    ).orderBy("nation", "segment")


def _dp_release_oracle() -> str:
    draw = "(" + _MD5.format(
        e="'dp:'||CAST(c_nationkey AS VARCHAR)||'|'||c_mktsegment"
    ) + f") % {_DP_GRID}"
    branches = "\n           ".join(
        f"WHEN draw < {t} THEN {i - DP_TRUNC}"
        for i, t in enumerate(DP_THRESHOLDS)
    )
    return f"""
WITH cells AS (
  SELECT c_nationkey AS nation, c_mktsegment AS segment,
         CAST(count(*) AS BIGINT) AS true_n,
         {draw} AS draw
  FROM customer GROUP BY 1, 2
)
SELECT nation, segment,
       CAST(greatest(true_n + CASE {branches}
           ELSE {DP_TRUNC} END, 0) AS BIGINT) AS released_n
FROM cells
ORDER BY nation, segment
"""


# --------------------------------------------------------------------------
# pipe_watermark_lateness — watermark retention curve: for each
# candidate watermark delay D, the share of events a streaming job
# would RETAIN (lateness ≤ D), where an event's lateness is the gap
# between its own event time and the per-key running-max event time at
# its arrival — exactly the quantity Structured Streaming's
# withWatermark drops on. This is the audit that picks the watermark:
# run it over a day of ingest, read off the smallest D that keeps your
# retention SLO, instead of guessing "10 minutes" and silently losing
# the tail (the failure mode the streaming gotchas doc records).
# The testdata's events are perfectly time-ordered (zero lateness), so
# arrival is modeled as event time plus a DETERMINISTIC hash-bounded
# delay (≤ WM_JITTER_US = 6 h — the batched-client upload pattern of
# mobile telemetry, and the bounded-disorder shape real ingest has; a
# full hash permutation would destroy time locality and flatline the
# curve) — the same rand()-free device every sampler here uses: it
# simulates upload delay identically in both engines, keeping the
# operator oracle-checkable end to end.
# Scale shape: ONE key-partitioned shuffle (the window's partitionBy —
# the partitioning ingest already has), running max is a within-key
# prefix scan; the retention census is conditional SUMs folded
# map-side into |DELAYS| rows. A pathological hot key is the chunked
# prefix-scan case operators/recurrence.py solves (prefix max is an
# associative fold). ppm is integer floor division — no float.
# --------------------------------------------------------------------------
WM_DELAYS_S = [0, 900, 1800, 3600, 7200, 14400, 21600]
WM_JITTER_US = 21_600_000_000  # arrival = event time + hash % 6 h


def pipe_watermark_lateness(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    jitter = F.pmod(
        md5_long(F.concat(F.lit("arr:"), F.col("event_id").cast("string"))),
        F.lit(WM_JITTER_US),
    )
    x = ev.select(
        "user_id", "event_id",
        F.unix_micros("ts").alias("tsu"),
        (F.unix_micros("ts") + jitter).alias("arr"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("arr", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    late = x.select((F.max("tsu").over(w) - F.col("tsu")).alias("late_us"))
    counts = late.agg(
        F.count(F.lit(1)).alias("n_events"),
        *[
            F.sum(
                (F.col("late_us") <= d * 1_000_000).cast("long")
            ).alias(f"d{d}")
            for d in WM_DELAYS_S
        ],
    )
    stacked = counts.select(
        "n_events",
        F.expr(
            "stack({n}, {args}) AS (delay_s, n_retained)".format(
                n=len(WM_DELAYS_S),
                args=", ".join(f"{d}L, d{d}" for d in WM_DELAYS_S),
            )
        ),
    )
    return stacked.select(
        "delay_s",
        "n_retained",
        F.expr("n_retained * 1000000 div n_events").alias("retained_ppm"),
    ).orderBy("delay_s")


def _watermark_lateness_oracle() -> str:
    h = _MD5.format(e="'arr:'||CAST(event_id AS VARCHAR)")
    vals = ", ".join(f"({d})" for d in WM_DELAYS_S)
    return f"""
WITH r AS (
  SELECT epoch_us(ts) AS tsu,
         max(epoch_us(ts)) OVER (
           PARTITION BY user_id
           ORDER BY epoch_us(ts) + ({h}) % {WM_JITTER_US}, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS runmax
  FROM events
),
l AS (SELECT runmax - tsu AS late_us FROM r),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n_events FROM l)
SELECT CAST(d.delay_s AS BIGINT) AS delay_s,
       CAST(sum(CASE WHEN l.late_us <= CAST(d.delay_s AS BIGINT) * 1000000
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_retained,
       CAST(sum(CASE WHEN l.late_us <= CAST(d.delay_s AS BIGINT) * 1000000
                     THEN 1 ELSE 0 END) * 1000000
            // max(tot.n_events) AS BIGINT) AS retained_ppm
FROM l, tot, (VALUES {vals}) d(delay_s)
GROUP BY d.delay_s
ORDER BY delay_s
"""


# --------------------------------------------------------------------------
# pipe_snapshot_diff — dataset-version diff census: given two corpus
# snapshots, classify every document as added / removed / modified /
# unchanged by content fingerprint and census the churn per source —
# the audit every versioned training-data release publishes (what
# changed between v1 and v2, and how much text moved). Here v2 is
# DERIVED deterministically from v1 (hash-gated 1-in-20 deletes,
# 1-in-20 text edits, 1-in-20 additions under a disjoint id namespace)
# so the operator is oracle-checkable; against real stored snapshots
# the shape is identical.
# Scale shape: the diff is ONE full-outer equi-join on doc_id — with
# both snapshot tables bucketed by doc_id (how versioned corpora
# should be stored) it is co-located and shuffle-free; the census is a
# (source × 4)-row aggregation. No fingerprint table needs to fit
# anywhere: the hash compare happens row-wise inside the join.
# --------------------------------------------------------------------------
SNAP_ADD_BASE = 10**12


def pipe_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    gate = lambda tag: (  # noqa: E731
        md5_long(F.concat(F.lit(tag), F.col("doc_id").cast("string"))) % 20
    )
    v1 = docs.select("doc_id", "source", "text")
    kept = v1.filter(gate("snapdel:") != 0)
    edited = kept.withColumn(
        "text",
        F.when(
            gate("snapedit:") == 0, F.concat(F.col("text"), F.lit(" [rev2]"))
        ).otherwise(F.col("text")),
    )
    added = v1.filter(gate("snapadd:") == 0).select(
        (F.col("doc_id") + F.lit(SNAP_ADD_BASE)).alias("doc_id"),
        "source", "text",
    )
    v2 = edited.unionByName(added)

    fp = lambda c: md5_long(F.col(c))  # noqa: E731
    a = v1.select(
        "doc_id", F.col("source").alias("src1"), fp("text").alias("fp1"),
        F.length("text").cast("long").alias("len1"),
    )
    b = v2.select(
        "doc_id", F.col("source").alias("src2"), fp("text").alias("fp2"),
        F.length("text").cast("long").alias("len2"),
    )
    j = a.join(b, "doc_id", "full_outer")
    status = (
        F.when(F.col("fp1").isNull(), F.lit("added"))
        .when(F.col("fp2").isNull(), F.lit("removed"))
        .when(F.col("fp1") == F.col("fp2"), F.lit("unchanged"))
        .otherwise(F.lit("modified"))
    )
    return (
        j.select(
            F.coalesce("src1", "src2").alias("source"),
            status.alias("status"),
            (F.coalesce("len2", F.lit(0)) - F.coalesce("len1", F.lit(0)))
            .alias("delta_chars"),
        )
        .groupBy("source", "status")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("delta_chars").alias("delta_chars"),
        )
        .orderBy("source", "status")
    )


_SNAP_DEL = _MD5.format(e="'snapdel:'||CAST(doc_id AS VARCHAR)") + " % 20"
_SNAP_EDIT = _MD5.format(e="'snapedit:'||CAST(doc_id AS VARCHAR)") + " % 20"
_SNAP_ADD = _MD5.format(e="'snapadd:'||CAST(doc_id AS VARCHAR)") + " % 20"
ORACLE_PIPE_SNAPSHOT_DIFF = f"""
WITH v1 AS (SELECT doc_id, source, text FROM documents),
v2 AS (
  SELECT doc_id, source,
         CASE WHEN {_SNAP_EDIT} = 0 THEN text || ' [rev2]' ELSE text END AS text
  FROM v1 WHERE {_SNAP_DEL} != 0
  UNION ALL
  SELECT doc_id + {SNAP_ADD_BASE}, source, text
  FROM v1 WHERE {_SNAP_ADD} = 0
),
a AS (SELECT doc_id, source AS src1, {_MD5.format(e='text')} AS fp1,
             CAST(len(text) AS BIGINT) AS len1 FROM v1),
b AS (SELECT doc_id, source AS src2, {_MD5.format(e='text')} AS fp2,
             CAST(len(text) AS BIGINT) AS len2 FROM v2),
j AS (
  SELECT coalesce(a.src1, b.src2) AS source,
         CASE WHEN a.fp1 IS NULL THEN 'added'
              WHEN b.fp2 IS NULL THEN 'removed'
              WHEN a.fp1 = b.fp2 THEN 'unchanged'
              ELSE 'modified' END AS status,
         coalesce(b.len2, 0) - coalesce(a.len1, 0) AS delta_chars
  FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id
)
SELECT source, status, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(SUM(delta_chars) AS BIGINT) AS delta_chars
FROM j GROUP BY source, status
ORDER BY source, status
"""


# --------------------------------------------------------------------------
# pipe_quality_rules — Gopher-style per-document rule filter (Rae et
# al. 2021 §A1.1 re-expressed): five cheap structural rules, each a
# boolean column so the report says WHY a document fell out, plus the
# conjunctive keep flag. Every rule is an integer cross-multiply
# (never a float ratio compare), so the table hash-verifies exactly.
# Pure scan shape — no shuffle at any corpus size; at 100 TB this is
# the first pass over raw text and runs at I/O speed.
# --------------------------------------------------------------------------
QR_MIN_TOKENS, QR_MAX_TOKENS = 5, 100_000
QR_MIN_MWL, QR_MAX_MWL = 2, 12  # mean word length bounds
QR_MAX_SYMBOL_PCT = 20  # punctuation chars ≤ 20% of text
QR_MIN_TTR_PCT = 20  # distinct/total tokens ≥ 20%


def pipe_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jobx_spark.operators.text import punct_count, stopword_count

    docs = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    n_toks = F.size(toks).cast("long")
    # total non-whitespace chars == sum of token lengths, without a
    # higher-order lambda (stays in codegen)
    nospace = F.length(
        F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", "")
    ).cast("long")
    n_distinct = F.size(F.array_distinct(toks)).cast("long")
    r_wordcount = (n_toks >= QR_MIN_TOKENS) & (n_toks <= QR_MAX_TOKENS)
    r_wordlen = (nospace >= QR_MIN_MWL * n_toks) & (nospace <= QR_MAX_MWL * n_toks)
    r_symbol = punct_count(F.col("text")) * 100 <= F.length("text").cast("long") * QR_MAX_SYMBOL_PCT
    r_stopword = stopword_count(F.col("text"), "en") >= 1
    r_repetition = n_distinct * 100 >= n_toks * QR_MIN_TTR_PCT
    return docs.select(
        "doc_id",
        n_toks.alias("n_tokens"),
        r_wordcount.alias("r_wordcount"),
        r_wordlen.alias("r_wordlen"),
        r_symbol.alias("r_symbol"),
        r_stopword.alias("r_stopword"),
        r_repetition.alias("r_repetition"),
        (r_wordcount & r_wordlen & r_symbol & r_stopword & r_repetition).alias("keep"),
    ).orderBy("doc_id")


def _quality_rules_oracle() -> str:
    from jobx_spark.operators.text import LANG_STOPWORDS, PUNCT_CLASS

    en = LANG_STOPWORDS["en"]
    return f"""
WITH t AS (
  SELECT doc_id,
         CAST(len({_TOKS}) AS BIGINT) AS n_tokens,
         CAST(len(regexp_replace(lower(trim(text)), '\\s+', '', 'g')) AS BIGINT) AS nospace,
         CAST(len(list_distinct({_TOKS})) AS BIGINT) AS n_distinct,
         CAST(len(regexp_replace(text, '{PUNCT_CLASS}', '', 'g')) AS BIGINT) AS n_punct,
         CAST(len(text) AS BIGINT) AS n_chars,
         CAST(len(list_intersect({_TOKS}, {en!r})) AS BIGINT) AS n_stop
  FROM documents
)
SELECT doc_id, n_tokens,
       n_tokens >= {QR_MIN_TOKENS} AND n_tokens <= {QR_MAX_TOKENS} AS r_wordcount,
       nospace >= {QR_MIN_MWL} * n_tokens AND nospace <= {QR_MAX_MWL} * n_tokens AS r_wordlen,
       n_punct * 100 <= n_chars * {QR_MAX_SYMBOL_PCT} AS r_symbol,
       n_stop >= 1 AS r_stopword,
       n_distinct * 100 >= n_tokens * {QR_MIN_TTR_PCT} AS r_repetition,
       (n_tokens >= {QR_MIN_TOKENS} AND n_tokens <= {QR_MAX_TOKENS})
         AND (nospace >= {QR_MIN_MWL} * n_tokens AND nospace <= {QR_MAX_MWL} * n_tokens)
         AND (n_punct * 100 <= n_chars * {QR_MAX_SYMBOL_PCT})
         AND (n_stop >= 1)
         AND (n_distinct * 100 >= n_tokens * {QR_MIN_TTR_PCT}) AS keep
FROM t
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# pipe_skew_census — the join-key skew diagnostic you run BEFORE
# choosing a salting factor (operators/skew.py implements the cure;
# this measures the disease): for each candidate join/aggregation key
# of the fact table, the SKEW_K heaviest values with row count, table
# share in ppm, and rank. A key whose top value holds >1% of a 10¹¹-row
# table is the one that stalls a 1000-executor shuffle on one task —
# this census is what picks the salt factor (share·partitions ≈ tasks
# per hot key). Shape (VERDICT r7 #1 — the old single window over ALL
# of a column's aggregated counts put the fact table's entire distinct-
# key census in ONE task): per audited column, an independent
# single-column scan → map-side-combinable count → orderBy+limit, which
# Catalyst executes as TakeOrderedAndProject — every task keeps only
# its local top-SKEW_K heap, the driver merges K-sized heaps. No
# corpus-sized window partition anywhere; the only window left ranks
# the ≤ columns·SKEW_K union. Per-column scans read exactly one parquet
# column each (vs the old explode that read all of them and ×|cols| the
# row count before the shuffle). Output ≤ columns·SKEW_K rows.
# --------------------------------------------------------------------------
SKEW_K = 5
SKEW_COLS = ["l_orderkey", "l_suppkey", "l_partkey"]


def pipe_skew_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    from functools import reduce

    from pyspark.sql import Window as W

    li = load_table(spark, sf_dir, "lineitem")
    tops = [
        li.select(F.col(c).cast("long").alias("key"))
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .orderBy(F.desc("n_rows"), F.asc("key"))
        .limit(SKEW_K)
        .select(F.lit(c).alias("key_col"), "key", "n_rows")
        for c in SKEW_COLS
    ]
    counts = reduce(lambda a, b: a.unionByName(b), tops)
    total = li.select(F.count(F.lit(1)).alias("n_table"))
    # rank over ≤ SKEW_K rows per column — bounded by the limit above
    rk = F.row_number().over(
        W.partitionBy("key_col").orderBy(F.desc("n_rows"), F.asc("key"))
    )
    return (
        counts.withColumn("rank", rk.cast("int"))
        .crossJoin(F.broadcast(total))
        .select(
            "key_col", "rank", "key", "n_rows",
            F.expr("n_rows * 1000000 div n_table").alias("share_ppm"),
        )
        .orderBy("key_col", "rank")
    )


ORACLE_PIPE_SKEW_CENSUS = f"""
WITH pairs AS (
  {" UNION ALL ".join(
      f"SELECT '{c}' AS key_col, CAST({c} AS BIGINT) AS key FROM lineitem"
      for c in SKEW_COLS
  )}
),
counts AS (
  SELECT key_col, key, CAST(count(*) AS BIGINT) AS n_rows
  FROM pairs GROUP BY 1, 2
),
ranked AS (
  SELECT key_col, key, n_rows,
         CAST(row_number() OVER (PARTITION BY key_col
              ORDER BY n_rows DESC, key ASC) AS INTEGER) AS rank
  FROM counts
)
SELECT key_col, rank, key, n_rows,
       CAST(n_rows * 1000000
            // (SELECT CAST(count(*) AS BIGINT) FROM lineitem) AS BIGINT)
         AS share_ppm
FROM ranked WHERE rank <= {SKEW_K}
ORDER BY key_col, rank
"""


# --------------------------------------------------------------------------
# pipe_shuffle_audit — training-order mixing audit: assign every
# document its position-decile in the global hash-shuffled training
# order and census decile × source. A healthy shuffle shows every
# source spread uniformly across deciles; clumping means the model
# sees a de-facto curriculum (all of source X early, all of Y late)
# that nobody chose. The training order IS the hash (md5_long of the
# doc id, the repo-wide rand()-free device), so the decile is pure
# scan-side arithmetic — h div (2⁶⁰/10) — and NO global sort is
# needed to audit a corpus-sized ordering: the audit costs one
# map-side-combinable (decile, source) aggregation at any scale.
# share_ppm says what fraction of the decile each source holds; the
# uniform expectation is that source's corpus share, so deviation is
# readable per row.
# --------------------------------------------------------------------------
_SHUF_DECILE_DIV = (1 << 60) // 10


def pipe_shuffle_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    h = md5_long(F.concat(F.lit("shuf:"), F.col("doc_id").cast("string")))
    cells = (
        docs.select(h.alias("h"), "source")
        .select(F.expr(f"h div {_SHUF_DECILE_DIV}").alias("decile"), "source")
        .groupBy("decile", "source")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    dec_total = F.sum("n_docs").over(W.partitionBy("decile"))
    return (
        cells.withColumn("decile_docs", dec_total)
        .select(
            "decile", "source", "n_docs", "decile_docs",
            F.expr("n_docs * 1000000 div decile_docs").alias("share_ppm"),
        )
        .orderBy("decile", "source")
    )


_SHUF_H = _MD5.format(e="'shuf:' || CAST(doc_id AS VARCHAR)")
ORACLE_PIPE_SHUFFLE_AUDIT = f"""
WITH cells AS (
  SELECT ({_SHUF_H}) // {_SHUF_DECILE_DIV} AS decile, source,
         CAST(count(*) AS BIGINT) AS n_docs
  FROM documents GROUP BY 1, 2
)
SELECT decile, source, n_docs,
       CAST(SUM(n_docs) OVER (PARTITION BY decile) AS BIGINT) AS decile_docs,
       CAST(n_docs * 1000000
            // SUM(n_docs) OVER (PARTITION BY decile) AS BIGINT) AS share_ppm
FROM cells
ORDER BY decile, source
"""


# --------------------------------------------------------------------------
# pipe_dataset_card — the per-source release card a dataset ships
# with: document count, token mass, EXACT token-length percentiles
# (p50/p90/p99 — the distribution facts min/mean/max hide; a source
# whose p99 is 100× its p50 needs length-aware packing), language
# spread, and the dominant language. Percentiles are discrete
# (percentile_disc: the value AT rank ⌈p·n⌉ under the deterministic
# (length, doc_id) order — q24's device), so they hash-verify where
# interpolating percentiles would be float-fragile.
# Scale shape (VERDICT r7 #1 — the old plan ranked EVERY document of a
# source through one window task): token length is a SMALL-DOMAIN
# integer, so the exact percentile never needs a per-document rank —
# groupBy(source, n_toks).count() collapses the corpus map-side to a
# |sources|·|distinct lengths| table, the cumulative rank runs along
# THAT (window partition = distinct lengths per source, bounded by the
# token-length domain, not the corpus), and the value at rank ⌈p·n⌉ is
# the smallest length whose cumulative count reaches it. Same oracle,
# same answer, no corpus-sized window; doc_id only ever tiebroke WITHIN
# equal lengths, where the length value is constant anyway. Lang cells
# and the source rollup stay map-side-combinable; output |sources| rows.
# --------------------------------------------------------------------------
def pipe_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    n_toks = F.size(tokens(F.col("text"))).cast("long")
    lens = (
        docs.select("source", n_toks.alias("n_toks"))
        .groupBy("source", "n_toks")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    cum = lens.select(
        "source", "n_toks", "cnt",
        F.sum("cnt").over(
            W.partitionBy("source").orderBy("n_toks")
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        ).alias("cum"),
        F.sum("cnt").over(W.partitionBy("source")).alias("n"),
    )

    def at(p: float):
        pos = F.ceil(F.lit(p) * F.col("n")).cast("long")
        return F.min(F.when(F.col("cum") >= pos, F.col("n_toks")))

    card = cum.groupBy("source").agg(
        F.sum("cnt").alias("n_docs"),
        F.sum(F.col("n_toks") * F.col("cnt")).alias("total_tokens"),
        at(0.5).alias("p50_tokens"),
        at(0.9).alias("p90_tokens"),
        at(0.99).alias("p99_tokens"),
    )
    langs = (
        docs.groupBy("source", "lang")
        .agg(F.count(F.lit(1)).alias("lc"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_langs"),
            F.max(F.struct("lc", "lang")).alias("top"),
        )
        .select("source", "n_langs", F.col("top.lang").alias("top_lang"))
    )
    return card.join(langs, "source").select(
        "source", "n_docs", "total_tokens", "p50_tokens", "p90_tokens",
        "p99_tokens", "n_langs", "top_lang",
    ).orderBy("source")


ORACLE_PIPE_DATASET_CARD = f"""
WITH t AS (
  SELECT source, lang, doc_id, CAST(len({_TOKS}) AS BIGINT) AS n_toks
  FROM documents
),
r AS (
  SELECT source, lang, n_toks,
         row_number() OVER (PARTITION BY source ORDER BY n_toks, doc_id) AS rn,
         count(*) OVER (PARTITION BY source) AS n
  FROM t
),
card AS (
  SELECT source,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_toks) AS BIGINT) AS total_tokens,
         CAST(MAX(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT)
                  THEN n_toks END) AS BIGINT) AS p50_tokens,
         CAST(MAX(CASE WHEN rn = CAST(ceil(0.9 * n) AS BIGINT)
                  THEN n_toks END) AS BIGINT) AS p90_tokens,
         CAST(MAX(CASE WHEN rn = CAST(ceil(0.99 * n) AS BIGINT)
                  THEN n_toks END) AS BIGINT) AS p99_tokens,
         CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
  FROM r GROUP BY source
),
tl AS (
  SELECT source, (max(ROW(lc, lang)))[2] AS top_lang
  FROM (SELECT source, lang, CAST(count(*) AS BIGINT) AS lc
        FROM documents GROUP BY 1, 2)
  GROUP BY source
)
SELECT card.*, tl.top_lang
FROM card JOIN tl USING (source)
ORDER BY source
"""


# --------------------------------------------------------------------------
# pipe_curriculum_order — length-curriculum schedule census (Bengio et
# al. 2009's curriculum learning, with document length as the standard
# cheap difficulty proxy — short-to-long is the schedule sequence-
# model curricula actually use): split the corpus into CURR_PHASES
# quartile phases by token count and report, per (phase, source), the
# doc count, token mass, and length range, with the exact thresholds
# riding along. This is the table a training job consumes to build its
# phase manifests — and the per-source breakdown says whether the
# curriculum starves a source early (a source whose docs are all long
# contributes nothing to phase 1).
# Scale shape: the pipe_dataset_card device — exact quartile thresholds
# come from a cumulative window over the (n_toks, count) table
# (value-domain-bounded, declared), NEVER an ntile over the corpus
# (which would serialize every row through one task); phase assignment
# is then scan-side comparison against the broadcast 1-row threshold
# table, and the census is a ≤ CURR_PHASES·|sources|-row rollup. All
# integer.
# --------------------------------------------------------------------------
CURR_PHASES = 4  # quartile curriculum: shortest docs first


def pipe_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "source", F.size(tokens(F.col("text"))).cast("long").alias("n_toks")
    )
    lens = base.groupBy("n_toks").agg(F.count(F.lit(1)).alias("cnt"))
    cum = lens.select(
        "n_toks",
        "cnt",
        F.sum("cnt")
        .over(
            W.partitionBy().orderBy("n_toks")
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        .alias("cum"),
        F.sum("cnt").over(W.partitionBy()).alias("n"),
    )

    def at(p: float):
        pos = F.ceil(F.lit(p) * F.col("n")).cast("long")
        return F.min(F.when(F.col("cum") >= pos, F.col("n_toks")))

    thr = cum.agg(
        at(0.25).alias("t25"), at(0.5).alias("t50"), at(0.75).alias("t75")
    )
    gt = lambda t: (F.col("n_toks") > F.col(t)).cast("long")  # noqa: E731
    phased = base.crossJoin(F.broadcast(thr)).select(
        "source",
        "n_toks",
        "t25",
        "t50",
        "t75",
        (F.lit(1) + gt("t25") + gt("t50") + gt("t75")).cast("int").alias(
            "phase"
        ),
    )
    return (
        phased.groupBy("phase", "source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_toks").cast("long").alias("phase_tokens"),
            F.min("n_toks").cast("long").alias("min_toks"),
            F.max("n_toks").cast("long").alias("max_toks"),
            F.min("t25").cast("long").alias("t25"),
            F.min("t50").cast("long").alias("t50"),
            F.min("t75").cast("long").alias("t75"),
        )
        .orderBy("phase", "source")
    )


ORACLE_PIPE_CURRICULUM = f"""
WITH t AS (
  SELECT source, CAST(len({_TOKS}) AS BIGINT) AS n_toks FROM documents
),
l AS (SELECT n_toks, CAST(count(*) AS BIGINT) AS cnt FROM t GROUP BY n_toks),
c AS (
  SELECT n_toks, cnt,
         CAST(SUM(cnt) OVER (ORDER BY n_toks
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
         CAST(SUM(cnt) OVER () AS BIGINT) AS n
  FROM l
),
thr AS (
  SELECT
    MIN(CASE WHEN cum >= CAST(ceil(0.25 * n) AS BIGINT)
             THEN n_toks END) AS t25,
    MIN(CASE WHEN cum >= CAST(ceil(0.5 * n) AS BIGINT)
             THEN n_toks END) AS t50,
    MIN(CASE WHEN cum >= CAST(ceil(0.75 * n) AS BIGINT)
             THEN n_toks END) AS t75
  FROM c
),
phased AS (
  SELECT t.source, t.n_toks, thr.t25, thr.t50, thr.t75,
         CAST(1 + (CASE WHEN t.n_toks > thr.t25 THEN 1 ELSE 0 END)
                + (CASE WHEN t.n_toks > thr.t50 THEN 1 ELSE 0 END)
                + (CASE WHEN t.n_toks > thr.t75 THEN 1 ELSE 0 END)
          AS INTEGER) AS phase
  FROM t, thr
)
SELECT phase, source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_toks) AS BIGINT) AS phase_tokens,
       CAST(MIN(n_toks) AS BIGINT) AS min_toks,
       CAST(MAX(n_toks) AS BIGINT) AS max_toks,
       CAST(MIN(t25) AS BIGINT) AS t25,
       CAST(MIN(t50) AS BIGINT) AS t50,
       CAST(MIN(t75) AS BIGINT) AS t75
FROM phased
GROUP BY phase, source
ORDER BY phase, source
"""


# --------------------------------------------------------------------------
# pipe_quality_funnel — the ORDERED filter funnel over the same five
# Gopher-style rules as pipe_quality_rules: each document is charged
# to the FIRST rule that rejects it (the attribution real pipeline
# reports use — "rule 3 removed 2% OF WHAT SURVIVED rules 1-2", not
# the parallel per-rule flags the rules query emits). One row per
# stage: docs entering, docs removed, docs surviving, and the removal
# rate in ppm of the stage's own input. The funnel is how a data team
# decides which rule to re-tune: a rule that removes nothing after its
# predecessors is dead weight; one that removes half its input is
# either load-bearing or broken.
# Scale shape: ONE corpus scan computes the first-fail stage id per
# doc (pure scan-side arithmetic, no shuffle); the census is a ≤6-row
# aggregation; the cumulative docs-in arithmetic runs as a window over
# those ≤6 rows (driver-scale regardless of corpus size). The ppm is
# integer: removed·10⁶ div docs_in.
# --------------------------------------------------------------------------
QF_RULES = ["wordcount", "wordlen", "symbol", "stopword", "repetition"]


def pipe_quality_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from jobx_spark.operators.text import punct_count, stopword_count

    docs = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    n_toks = F.size(toks).cast("long")
    nospace = F.length(
        F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", "")
    ).cast("long")
    n_distinct = F.size(F.array_distinct(toks)).cast("long")
    r_wordcount = (n_toks >= QR_MIN_TOKENS) & (n_toks <= QR_MAX_TOKENS)
    r_wordlen = (nospace >= QR_MIN_MWL * n_toks) & (nospace <= QR_MAX_MWL * n_toks)
    r_symbol = (
        punct_count(F.col("text")) * 100
        <= F.length("text").cast("long") * QR_MAX_SYMBOL_PCT
    )
    r_stopword = stopword_count(F.col("text"), "en") >= 1
    r_repetition = n_distinct * 100 >= n_toks * QR_MIN_TTR_PCT
    first_fail = (
        F.when(~r_wordcount, 1)
        .when(~r_wordlen, 2)
        .when(~r_symbol, 3)
        .when(~r_stopword, 4)
        .when(~r_repetition, 5)
        .otherwise(0)
        .cast("long")
    )
    removed = (
        docs.select(first_fail.alias("ff"))
        .groupBy("ff")
        .agg(F.count(F.lit(1)).alias("removed"))
    )
    total = docs.select(F.count(F.lit(1)).alias("total"))
    stages = spark.range(1, len(QF_RULES) + 1).select(
        F.col("id").alias("stage")
    )
    dense = (
        stages.join(removed, stages.stage == removed.ff, "left")
        .crossJoin(F.broadcast(total))
        .select(
            "stage",
            F.coalesce("removed", F.lit(0)).alias("removed"),
            "total",
        )
    )
    cum_before = F.coalesce(
        F.sum("removed").over(
            W.orderBy("stage").rowsBetween(W.unboundedPreceding, -1)
        ),
        F.lit(0),
    )
    rules = F.array(*[F.lit(r) for r in QF_RULES])
    return (
        dense.withColumn("docs_in", F.col("total") - cum_before)
        .select(
            "stage",
            F.element_at(rules, F.col("stage").cast("int")).alias("rule"),
            "docs_in",
            "removed",
            (F.col("docs_in") - F.col("removed")).alias("docs_out"),
            F.expr(
                "CASE WHEN docs_in = 0 THEN 0"
                "     ELSE (removed * 1000000) div docs_in END"
            ).alias("removed_ppm"),
        )
        .orderBy("stage")
    )


def _quality_funnel_oracle() -> str:
    from jobx_spark.operators.text import LANG_STOPWORDS, PUNCT_CLASS

    en = LANG_STOPWORDS["en"]
    rules_list = ", ".join(f"'{r}'" for r in QF_RULES)
    return f"""
WITH t AS (
  SELECT CAST(len({_TOKS}) AS BIGINT) AS n_tokens,
         CAST(len(regexp_replace(lower(trim(text)), '\\s+', '', 'g')) AS BIGINT) AS nospace,
         CAST(len(list_distinct({_TOKS})) AS BIGINT) AS n_distinct,
         CAST(len(regexp_replace(text, '{PUNCT_CLASS}', '', 'g')) AS BIGINT) AS n_punct,
         CAST(len(text) AS BIGINT) AS n_chars,
         CAST(len(list_intersect({_TOKS}, {en!r})) AS BIGINT) AS n_stop
  FROM documents
),
ff AS (
  SELECT CASE
    WHEN NOT (n_tokens >= {QR_MIN_TOKENS} AND n_tokens <= {QR_MAX_TOKENS}) THEN 1
    WHEN NOT (nospace >= {QR_MIN_MWL} * n_tokens
              AND nospace <= {QR_MAX_MWL} * n_tokens) THEN 2
    WHEN NOT (n_punct * 100 <= n_chars * {QR_MAX_SYMBOL_PCT}) THEN 3
    WHEN NOT (n_stop >= 1) THEN 4
    WHEN NOT (n_distinct * 100 >= n_tokens * {QR_MIN_TTR_PCT}) THEN 5
    ELSE 0 END AS ff
  FROM t
),
rm AS (SELECT ff, CAST(count(*) AS BIGINT) AS removed FROM ff GROUP BY ff),
dense AS (
  SELECT s.stage, coalesce(rm.removed, 0) AS removed,
         (SELECT CAST(count(*) AS BIGINT) FROM documents) AS total
  FROM (SELECT range AS stage FROM range(1, {len(QF_RULES) + 1})) s
  LEFT JOIN rm ON rm.ff = s.stage
),
cum AS (
  SELECT stage, removed, total,
         total - coalesce(SUM(removed) OVER (ORDER BY stage
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS docs_in
  FROM dense
)
SELECT stage, ([{rules_list}])[CAST(stage AS INT)] AS rule,
       CAST(docs_in AS BIGINT) AS docs_in, removed,
       CAST(docs_in - removed AS BIGINT) AS docs_out,
       CAST(CASE WHEN docs_in = 0 THEN 0
            ELSE (removed * 1000000) // docs_in END AS BIGINT) AS removed_ppm
FROM cum
ORDER BY stage
"""


# --------------------------------------------------------------------------
# pipe_mix_temperature — temperature-scaled domain mixing (the
# multilingual-LM data-balancing rule: sampling weight ∝ p_s^α with
# α = 1/2): per-source counts → integer-scaled √n weights → per-mille
# budget allocation. √ via IEEE-754 sqrt (correctly rounded in every
# engine) on an integer-scaled argument, then floor — so the weight
# table is bit-exact cross-engine, unlike a pow()-based formulation.
# Shape: ONE map-side-combinable count shuffle over the corpus; the
# 20-row weight table is driver-scale at any corpus size.
# --------------------------------------------------------------------------
MIXT_SCALE = 10**12  # inside the sqrt: weights carry 6 integer digits
MIXT_BUDGET = 100  # documents to allocate across sources


def pipe_mix_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(F.count("*").alias("n_docs"))
    sq = F.floor(
        F.sqrt(F.col("n_docs").cast("double") * F.lit(MIXT_SCALE).cast("double"))
    ).cast("long")
    s = counts.select("source", "n_docs", sq.alias("sq"))
    # the denominator via an unpartitioned window over the SOURCE table
    # (20 rows at any corpus size — the corpus itself scans exactly
    # once; a separate .agg() consumer re-scanned documents)
    tot = F.sum("sq").over(W.partitionBy())
    return (
        s.select("source", "n_docs", "sq", tot.alias("tot"))
        .select(
            "source",
            "n_docs",
            F.expr("(sq * 1000000) div tot").alias("weight_ppm"),
            F.expr(f"({MIXT_BUDGET} * sq) div tot").alias("target_docs"),
        )
        .orderBy("source")
    )


ORACLE_PIPE_MIX_TEMPERATURE = f"""
WITH c AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs FROM documents GROUP BY source
), s AS (
  SELECT source, n_docs,
         CAST(floor(sqrt(CAST(n_docs AS DOUBLE) * CAST({MIXT_SCALE} AS DOUBLE))) AS BIGINT) AS sq
  FROM c
), t AS (SELECT CAST(SUM(sq) AS BIGINT) AS tot FROM s)
SELECT source, n_docs,
       (sq * 1000000) // tot AS weight_ppm,
       ({MIXT_BUDGET} * sq) // tot AS target_docs
FROM s, t
ORDER BY source
"""


# --------------------------------------------------------------------------
# pipe_epochs_budget — data-constrained mixing audit (Muennighoff et
# al. 2023, "Scaling Data-Constrained Language Models"): under a fixed
# training-token budget, temperature-weighted sampling (α = 1/2, the
# pipe_mix_temperature weights computed over TOKENS rather than docs)
# makes small sources repeat — this census reports each source's
# allocated tokens and repeat count in milli-epochs, plus the paper's
# actionable flag: epochs > 4, past which repeated data's value decays
# rapidly (their Fig. 1 readout). This is the pre-training-run audit
# that catches "our weights make source X repeat 11 times" before the
# run, not after. The budget is EPOCHS_PASSES × total corpus tokens
# (the canonical data-constrained setup: you want more tokens than you
# uniquely have), so the audit is scale-invariant — uniform sources
# sit near EPOCHS_PASSES epochs and the flag fires exactly on sources
# the temperature upweights past EPOCHS_FLAG.
# Exactness: weights are floor(sqrt(tokens)) scaled integers (same
# IEEE sqrt both engines — the pipe_mix_temperature device WITHOUT its
# SCALE boost: sq ≤ √tokens keeps (budget % tot)·sq inside int64 even
# at petabyte-token corpora); everything after is int64 floor
# division, ordered budget-div-tot FIRST so budget·sq never forms.
# Scale shape:
# one documents scan → per-source token census (map-side combinable),
# then ~|sources|-row arithmetic via unpartitioned windows over the
# census (never a second corpus scan).
# --------------------------------------------------------------------------
EPOCHS_PASSES = 2  # budget = 2× unique corpus tokens
EPOCHS_FLAG = 4  # Muennighoff: >4 epochs ≈ diminishing returns


def pipe_epochs_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(
        F.sum(F.size(tokens(F.col("text"))).cast("long")).alias("src_tokens")
    )
    sq = F.floor(F.sqrt(F.col("src_tokens").cast("double"))).cast("long")
    s = counts.select("source", "src_tokens", sq.alias("sq"))
    w = W.partitionBy()
    s = s.select(
        "source", "src_tokens", "sq",
        F.sum("sq").over(w).alias("tot"),
        (F.sum("src_tokens").over(w) * F.lit(EPOCHS_PASSES)).alias("budget"),
    )
    # per-source share of the budget, overflow-safe order: the budget
    # (≤ passes·corpus tokens) is divided by tot FIRST
    alloc = "(budget div tot) * sq + ((budget % tot) * sq) div tot"
    return s.select(
        "source",
        "src_tokens",
        F.expr("(sq * 1000000) div tot").alias("weight_ppm"),
        F.expr(alloc).alias("alloc_tokens"),
        F.expr(f"(({alloc}) * 1000) div src_tokens").alias("epochs_milli"),
        (
            F.expr(f"(({alloc}) * 1000) div src_tokens")
            > F.lit(EPOCHS_FLAG * 1000)
        ).alias("over_budget"),
    ).orderBy("source")


_EB_ALLOC = "(budget // tot) * sq + ((budget % tot) * sq) // tot"
ORACLE_PIPE_EPOCHS_BUDGET = f"""
WITH c AS (
  SELECT source, CAST(SUM(len({_TOKS})) AS BIGINT) AS src_tokens
  FROM documents GROUP BY source
), s AS (
  SELECT source, src_tokens,
         CAST(floor(sqrt(CAST(src_tokens AS DOUBLE))) AS BIGINT) AS sq
  FROM c
), t AS (
  SELECT CAST(SUM(sq) AS BIGINT) AS tot,
         CAST(SUM(src_tokens) * {EPOCHS_PASSES} AS BIGINT) AS budget
  FROM s
)
SELECT source, src_tokens,
       (sq * 1000000) // tot AS weight_ppm,
       {_EB_ALLOC} AS alloc_tokens,
       (({_EB_ALLOC}) * 1000) // src_tokens AS epochs_milli,
       (({_EB_ALLOC}) * 1000) // src_tokens > {EPOCHS_FLAG * 1000} AS over_budget
FROM s, t
ORDER BY source
"""


# --------------------------------------------------------------------------
# pipe_unimax_mixing — UniMax budget allocation (Chung et al., "UniMax:
# Fairer and More Effective Language Sampling for Large-Scale
# Multilingual Pretraining", ICLR 2023): spread a total training-token
# budget B as UNIFORMLY as possible across sources, but cap every
# source at UNIMAX_EPOCHS passes over its own data — the published
# alternative to temperature sampling (pipe_mix_temperature) that
# never over-epochs a small source to feed the uniform share.
# The water-filling solution is CLOSED-FORM over the sorted source
# census, so the whole algorithm is three windows over a ~|sources|-row
# table — no iteration: sort sources by cap ascending; source i is
# saturated (gets its full cap) iff cap_i·(n−i+1) ≤ B−P_{i−1} (its cap
# fits the per-remaining-source share of what's left after everything
# smaller saturates; P = cumulative cap); the saturated set is a prefix
# of that order, every unsaturated source gets the integer water level
# ℓ = (B−P_k) div (n−k). All arithmetic is int64 — div/mod on token
# counts — so both engines agree bit-for-bit, and the div remainder is
# REPORTED (leftover_tokens) instead of silently vanishing.
# Scale shape: one corpus scan into a map-side-combinable per-source
# token census; every window runs over the |sources|-row census
# (declared in window_contract.py like pipe_epochs_budget). At 100 TB
# the census is a few hundred rows regardless of corpus size.
# --------------------------------------------------------------------------
UNIMAX_EPOCHS = 2  # per-source cap: at most 2 passes over its data
# budget = 1.9× corpus tokens: close enough to the 2× cap ceiling that
# the smallest sources saturate — both water-filling branches execute
# under the hash gate at every SF (uniform-ish sources put the level
# just above the smallest caps)
UNIMAX_B_NUM, UNIMAX_B_DEN = 19, 10


def pipe_unimax_mixing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    c = docs.groupBy("source").agg(
        F.sum(F.size(tokens(F.col("text"))).cast("long")).alias("src_tokens")
    )
    s = c.select(
        "source",
        "src_tokens",
        (F.col("src_tokens") * F.lit(UNIMAX_EPOCHS)).alias("cap"),
    )
    wsort = W.partitionBy().orderBy(F.col("cap").asc(), F.col("source").asc())
    wall = W.partitionBy()
    s = s.select(
        "source",
        "src_tokens",
        "cap",
        F.row_number().over(wsort).cast("long").alias("i"),
        F.sum("cap").over(wsort).alias("pfx"),  # P_i, cumulative cap
        F.count(F.lit(1)).over(wall).cast("long").alias("n"),
        F.expr(
            f"(sum(src_tokens) over () * {UNIMAX_B_NUM})"
            f" div {UNIMAX_B_DEN}"
        ).alias("b"),
    )
    # saturation test against the budget left after all smaller caps
    # saturate: cap_i·(n−i+1) ≤ B − P_{i−1}
    s = s.withColumn(
        "saturated", F.expr("cap * (n - i + 1) <= b - (pfx - cap)")
    )
    s = s.select(
        "*",
        F.sum(F.col("saturated").cast("long")).over(wall).alias("k"),
        F.sum(
            F.when(F.col("saturated"), F.col("cap")).otherwise(F.lit(0))
        ).over(wall).alias("pk"),
        F.sum("cap").over(wall).alias("pfx_n"),
    )
    lvl = "case when k < n then (b - pk) div (n - k) else 0 end"
    return s.select(
        "source",
        "src_tokens",
        F.col("cap").alias("cap_tokens"),
        F.col("i").alias("rank_by_cap"),
        "saturated",
        F.expr(lvl).cast("long").alias("level_tokens"),
        F.expr(f"case when saturated then cap else {lvl} end")
        .cast("long")
        .alias("alloc_tokens"),
        F.expr(
            f"(case when saturated then cap else {lvl} end) * 1000000 div b"
        ).cast("long").alias("alloc_ppm"),
        F.expr(
            "case when k < n then (b - pk) % (n - k) else b - pfx_n end"
        ).cast("long").alias("leftover_tokens"),
    ).orderBy("source")


def _unimax_oracle() -> str:
    return f"""
WITH c AS (
  SELECT source, CAST(SUM(len({_TOKS})) AS BIGINT) AS src_tokens
  FROM documents GROUP BY source
), s AS (
  SELECT source, src_tokens,
         CAST(src_tokens * {UNIMAX_EPOCHS} AS BIGINT) AS cap
  FROM c
), r AS (
  SELECT source, src_tokens, cap,
         CAST(row_number() OVER (ORDER BY cap ASC, source ASC) AS BIGINT) AS i,
         CAST(SUM(cap) OVER (ORDER BY cap ASC, source ASC
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS pfx,
         CAST(count(*) OVER () AS BIGINT) AS n,
         CAST((SUM(src_tokens) OVER () * {UNIMAX_B_NUM})
              // {UNIMAX_B_DEN} AS BIGINT) AS b
  FROM s
), sat AS (
  SELECT *, cap * (n - i + 1) <= b - (pfx - cap) AS saturated FROM r
), agg AS (
  SELECT *,
         CAST(SUM(CASE WHEN saturated THEN 1 ELSE 0 END) OVER ()
              AS BIGINT) AS k,
         CAST(SUM(CASE WHEN saturated THEN cap ELSE 0 END) OVER ()
              AS BIGINT) AS pk,
         CAST(SUM(cap) OVER () AS BIGINT) AS pfx_n
  FROM sat
)
SELECT source, src_tokens, cap AS cap_tokens, i AS rank_by_cap, saturated,
       CAST(CASE WHEN k < n THEN (b - pk) // (n - k) ELSE 0 END
            AS BIGINT) AS level_tokens,
       CAST(CASE WHEN saturated THEN cap
                 WHEN k < n THEN (b - pk) // (n - k) ELSE 0 END
            AS BIGINT) AS alloc_tokens,
       CAST((CASE WHEN saturated THEN cap
                  WHEN k < n THEN (b - pk) // (n - k) ELSE 0 END)
            * 1000000 // b AS BIGINT) AS alloc_ppm,
       CAST(CASE WHEN k < n THEN (b - pk) % (n - k)
                 ELSE b - pfx_n END AS BIGINT) AS leftover_tokens
FROM agg
ORDER BY source
"""


# --------------------------------------------------------------------------
# pipe_padding_waste — bucketed-batching overhead audit: assign every
# document to the smallest sequence-length boundary ≥ its token count
# (docs past the largest boundary truncate into it) and census, per
# boundary, the kept / padding / truncated token mass plus the padding
# overhead in ppm of the batch slots (n_docs × boundary). This is the
# training-efficiency companion to pipe_pack_sequences: packing
# eliminates padding, bucketed batching only bounds it — this table is
# the data-driven answer to "are these bucket edges wasting 30% of
# every batch, and how much text does the truncation cap destroy".
# Scale shape: one corpus scan, scan-side CASE arithmetic, one
# |boundaries|-row map-side-combinable census. All integer.
# --------------------------------------------------------------------------
PAD_BOUNDS = [16, 32, 64, 96]  # candidate max-seq-len bucket edges


def pipe_padding_waste(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    n = F.size(tokens(F.col("text"))).cast("long")
    top = PAD_BOUNDS[-1]
    boundary = F.lit(top)
    for b in reversed(PAD_BOUNDS):
        boundary = F.when(n <= b, F.lit(b)).otherwise(boundary)
    kept = F.least(n, F.lit(top))
    x = docs.select(
        boundary.alias("boundary"),
        kept.alias("kept"),
        (boundary - kept).alias("pad"),
        (n - kept).alias("trunc"),
    )
    return (
        x.groupBy("boundary")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("kept").alias("kept_tokens"),
            F.sum("pad").alias("pad_tokens"),
            F.sum("trunc").alias("trunc_tokens"),
        )
        .select(
            "boundary", "n_docs", "kept_tokens", "pad_tokens", "trunc_tokens",
            F.expr("(pad_tokens * 1000000) div (n_docs * boundary)").alias(
                "pad_ppm"
            ),
        )
        .orderBy("boundary")
    )


def _padding_waste_oracle() -> str:
    top = PAD_BOUNDS[-1]
    arms = " ".join(f"WHEN n <= {b} THEN {b}" for b in PAD_BOUNDS)
    return f"""
WITH t AS (
  SELECT CAST(len({_TOKS}) AS BIGINT) AS n FROM documents
), x AS (
  SELECT CASE {arms} ELSE {top} END AS boundary,
         least(n, {top}) AS kept,
         CASE {arms} ELSE {top} END - least(n, {top}) AS pad,
         n - least(n, {top}) AS trunc
  FROM t
), c AS (
  SELECT boundary, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(SUM(kept) AS BIGINT) AS kept_tokens,
         CAST(SUM(pad) AS BIGINT) AS pad_tokens,
         CAST(SUM(trunc) AS BIGINT) AS trunc_tokens
  FROM x GROUP BY boundary
)
SELECT boundary, n_docs, kept_tokens, pad_tokens, trunc_tokens,
       (pad_tokens * 1000000) // (n_docs * boundary) AS pad_ppm
FROM c
ORDER BY boundary
"""


# --------------------------------------------------------------------------
# pipe_ewma_user_value — per-key EXPONENTIALLY-DECAYED running
# statistic (the online loss-smoothing / rate-estimator shape): each
# user's event values folded in (ts, event_id) order through the
# integer recurrence acc ← (acc + x)//2 (α = 1/2 EWMA with exact
# dyadic decay — float pow() could never hash-verify). Per-key
# sequential recurrences don't vectorize into window functions, so
# this is the canonical ``applyInPandas`` use — but run through the
# CHUNKED fold (operators/recurrence.py): events collapse per
# (key, 4096-row chunk) to O(1) transfer functions of the closed form
# (a + Σ2^(i-1)xᵢ) >> L, then a summary-level replay per key, so no
# pandas group ever holds a hot key's full history (VERDICT r4 #7 —
# the 10⁹-event-key OOM cliff is structurally gone, exactly, not
# approximately). The oracle is the same fold as a DuckDB list_reduce
# over the identically-ordered list.
# Values are nonnegative (events.value ≥ 0), keeping // semantics
# engine-identical (DuckDB truncates toward zero, Python floors —
# equal on nonnegatives).
# --------------------------------------------------------------------------
EWMA_SCALE = 10**6


def pipe_ewma_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jobx_spark.lineage import cut_lineage
    from jobx_spark.operators.recurrence import ewma_dyadic_fold

    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        "user_id",
        F.floor(F.col("value") * EWMA_SCALE).cast("long").alias("x_s"),
        "ts",
        "event_id",
    )
    # cut before the orderBy: a global sort's range-partitioner SAMPLES
    # its child, re-executing the whole Arrow fold a second time
    # (measured 3.5 s fold → 6.6 s with orderBy at sf0.1); the fold
    # output is one row per key, so the materialization is keys-sized
    out = cut_lineage(
        ewma_dyadic_fold(
            base, key="user_id", value="x_s", order=["ts", "event_id"]
        ),
        "ewma-out",
    )
    return out.select(
        "user_id",
        "n_events",
        "ewma_s",
        (F.col("ewma_s").cast("double") / EWMA_SCALE).alias("ewma"),
    ).orderBy("user_id")


ORACLE_PIPE_EWMA = f"""
WITH ordered AS (
  SELECT user_id, CAST(floor(value * {EWMA_SCALE}) AS BIGINT) AS x_s,
         ts, event_id
  FROM events
),
folded AS (
  SELECT user_id,
         CAST(count(*) AS BIGINT) AS n_events,
         list_reduce(
           list_prepend(0::BIGINT, list(x_s ORDER BY ts, event_id)),
           (a, b) -> (a + b) // 2
         ) AS ewma_s
  FROM ordered GROUP BY user_id
)
SELECT user_id, n_events, ewma_s,
       ewma_s::DOUBLE / {EWMA_SCALE} AS ewma
FROM folded
ORDER BY user_id
"""


# --------------------------------------------------------------------------
# pipe_quantile_sketch — the MERGEABLE quantile path (VERDICT r7 #6),
# pipe_dataset_card's documented companion: the card's percentiles are
# exact because token length is a small-domain integer; for a
# continuous/wide-domain metric (here: document CHAR length) the 100 TB
# pattern is a fixed-rule histogram sketch — bin = value div BINW, a
# DATA-INDEPENDENT rule (unlike q66's corpus min/max scaling), which is
# exactly what makes per-source sketches mergeable by plain count
# addition across shards/days/sources without touching raw data.
# Mergeability is ATTESTED, not claimed, with text_hll_merge's twin-row
# device: the __merged__ row (per-source bin tables summed) must equal
# the __direct__ row (corpus sketch computed from scratch) bit-for-bit
# under the hash gate. Exact percentiles ride along per row (read off
# the (source, n_chars) count table — the dataset-card device) so the
# sketch's ≤ BINW error is inspectable per source.
# Scale shape: ONE corpus scan → map-side-combinable (source, bin)
# counts; every window runs over bin tables or value-count tables
# (domain-bounded, declared in plans/window_contract.py); output is
# |sources| + 2 rows, all-integer.
# --------------------------------------------------------------------------
QSK_BINW = 64
QSK_QS = [(50, 0.5), (90, 0.9), (99, 0.99)]


def pipe_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from jobx_spark.lineage import cut_lineage

    docs = load_table(spark, sf_dir, "documents")
    # ONE corpus scan: the (source, n_chars) count table feeds the
    # per-source sketch, the exact read-off, AND (summed) both corpus
    # rows — the domsig/hll device
    vc = cut_lineage(
        docs.select("source", F.col("n_chars").cast("long").alias("v"))
        .groupBy("source", "v")
        .agg(F.count(F.lit(1)).alias("c")),
        "qsk-vc",
    )

    def readoff(table: DataFrame, keys: list[str]) -> DataFrame:
        """Quantile read-off over a (keys..., v, c) count table: sketch
        estimate from the binned histogram + exact value, per key."""
        part = W.partitionBy(*keys) if keys else W.partitionBy()
        binned = (
            table.withColumn("bin", F.expr(f"v div {QSK_BINW}"))
            .groupBy(*keys, "bin")
            .agg(F.sum("c").alias("bc"))
        )
        bcum = binned.select(
            *keys, "bin", "bc",
            F.sum("bc").over(
                (W.partitionBy(*keys) if keys else W.partitionBy())
                .orderBy("bin").rowsBetween(W.unboundedPreceding, 0)
            ).alias("cum"),
            F.sum("bc").over(part).alias("n"),
        )
        vcum = table.select(
            *keys, "v",
            F.sum("c").over(
                (W.partitionBy(*keys) if keys else W.partitionBy())
                .orderBy("v").rowsBetween(W.unboundedPreceding, 0)
            ).alias("cum"),
            F.sum("c").over(part).alias("n"),
        )
        est_aggs, ex_aggs = [], []
        for tag, q in QSK_QS:
            pos = F.ceil(F.lit(q) * F.col("n")).cast("long")
            est_aggs.append(
                ((F.min(F.when(F.col("cum") >= pos, F.col("bin"))) + 1)
                 * QSK_BINW).cast("long").alias(f"p{tag}_est")
            )
            ex_aggs.append(
                F.min(F.when(F.col("cum") >= pos, F.col("v")))
                .cast("long").alias(f"p{tag}_exact")
            )
        est = bcum.groupBy(*keys).agg(F.max("n").alias("n_docs"), *est_aggs)
        exact = vcum.groupBy(*keys).agg(*ex_aggs)
        return est.join(exact, keys) if keys else est.crossJoin(
            F.broadcast(exact)
        )

    cols = [
        "source", "n_docs",
        "p50_est", "p90_est", "p99_est",
        "p50_exact", "p90_exact", "p99_exact",
    ]
    per_src = readoff(vc, ["source"]).select(*cols)
    # __merged__: per-source sketches merged by COUNT ADDITION — the
    # mergeability claim itself; __direct__: same table re-derived as
    # one corpus sketch. The two rows must hash-equal.
    corpus = cut_lineage(
        vc.groupBy("v").agg(F.sum("c").alias("c")), "qsk-corpus"
    )
    merged = readoff(corpus, []).select(
        F.lit("__merged__").alias("source"), *cols[1:]
    )
    direct = readoff(
        docs.select(F.col("n_chars").cast("long").alias("v"))
        .groupBy("v").agg(F.count(F.lit(1)).alias("c")),
        [],
    ).select(F.lit("__direct__").alias("source"), *cols[1:])
    return (
        per_src.unionByName(merged).unionByName(direct).orderBy("source")
    )


def _quantile_sketch_oracle() -> str:
    def ests(cum_tbl: str, grp: str) -> tuple[str, str]:
        """(est agg cols, exact agg cols) over a cum table."""
        e, x = [], []
        for tag, q in QSK_QS:
            pos = f"CAST(ceil({q} * n) AS BIGINT)"
            e.append(
                f"CAST((MIN(CASE WHEN cum >= {pos} THEN bin END) + 1)"
                f" * {QSK_BINW} AS BIGINT) AS p{tag}_est"
            )
            x.append(
                f"CAST(MIN(CASE WHEN cum >= {pos} THEN v END) AS BIGINT)"
                f" AS p{tag}_exact"
            )
        return ", ".join(e), ", ".join(x)

    se_cols, sx_cols = ests("sb", "source")
    est_names = ", ".join(f"p{t}_est" for t, _ in QSK_QS)
    ex_names = ", ".join(f"p{t}_exact" for t, _ in QSK_QS)
    return f"""
WITH vc AS MATERIALIZED (
  SELECT source, CAST(n_chars AS BIGINT) AS v, CAST(count(*) AS BIGINT) AS c
  FROM documents GROUP BY 1, 2
),
corpus AS MATERIALIZED (
  SELECT v, CAST(SUM(c) AS BIGINT) AS c FROM vc GROUP BY v
),
direct AS MATERIALIZED (
  SELECT CAST(n_chars AS BIGINT) AS v, CAST(count(*) AS BIGINT) AS c
  FROM documents GROUP BY 1
),
sb AS (
  SELECT source, bin, bc,
         SUM(bc) OVER (PARTITION BY source ORDER BY bin
                       ROWS UNBOUNDED PRECEDING) AS cum,
         SUM(bc) OVER (PARTITION BY source) AS n
  FROM (SELECT source, v // {QSK_BINW} AS bin, CAST(SUM(c) AS BIGINT) AS bc
        FROM vc GROUP BY 1, 2)
),
se AS (SELECT source, CAST(MAX(n) AS BIGINT) AS n_docs, {se_cols}
       FROM sb GROUP BY source),
sv AS (
  SELECT source, v,
         SUM(c) OVER (PARTITION BY source ORDER BY v
                      ROWS UNBOUNDED PRECEDING) AS cum,
         SUM(c) OVER (PARTITION BY source) AS n
  FROM vc
),
sx AS (SELECT source, {sx_cols} FROM sv GROUP BY source),
cb AS (
  SELECT bin, bc,
         SUM(bc) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cum,
         SUM(bc) OVER () AS n
  FROM (SELECT v // {QSK_BINW} AS bin, CAST(SUM(c) AS BIGINT) AS bc
        FROM corpus GROUP BY 1)
),
ce AS (SELECT CAST(MAX(n) AS BIGINT) AS n_docs, {se_cols} FROM cb),
cv AS (
  SELECT v, SUM(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum,
         SUM(c) OVER () AS n
  FROM corpus
),
cx AS (SELECT {sx_cols} FROM cv),
db AS (
  SELECT bin, bc,
         SUM(bc) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cum,
         SUM(bc) OVER () AS n
  FROM (SELECT v // {QSK_BINW} AS bin, CAST(SUM(c) AS BIGINT) AS bc
        FROM direct GROUP BY 1)
),
de AS (SELECT CAST(MAX(n) AS BIGINT) AS n_docs, {se_cols} FROM db),
dv AS (
  SELECT v, SUM(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum,
         SUM(c) OVER () AS n
  FROM direct
),
dx AS (SELECT {sx_cols} FROM dv)
SELECT se.source, se.n_docs, {est_names}, {ex_names}
FROM se JOIN sx USING (source)
UNION ALL
SELECT '__merged__' AS source, ce.n_docs, {est_names}, {ex_names}
FROM ce CROSS JOIN cx
UNION ALL
SELECT '__direct__' AS source, de.n_docs, {est_names}, {ex_names}
FROM de CROSS JOIN dx
ORDER BY source
"""


# --------------------------------------------------------------------------
# pipe_corpus_funnel — the END-TO-END corpus-build attrition report:
# the one table every training-data run publishes, showing how many
# documents and tokens survive each pipeline stage in order. Stages
# compose the repo's own gated kernels (this query is the composition
# certificate, not a new kernel):
#   1 raw          every document
#   2 exact_dedup  keep the min-doc_id representative of each
#                  normalized-text digest group (dedup_exact semantics,
#                  computed over ALL raw docs)
#   3 quality      the 5-rule keep predicate of pipe_quality_rules
#   4 lang_en      language filter
#   5 holdout      drop the benchmark slice (doc_id ≡ 0 mod 10 — the
#                  dedup_decontaminate eval split)
#   6 decontam     drop survivors whose digest appears in the eval
#                  slice (exact-match decontamination — the GPT-3-style
#                  baseline; the LSH/Bloom variants are the gated
#                  dedup_decontaminate / dedup_bloom_decontaminate)
# Scale shape: ONE documents scan materializes the per-doc flag table
# (digest, token count, rule bits); the keep-min table and the eval
# digest set both derive from that cut table and join back on digest —
# keyed shuffle joins with map-side-combinable aggregates (the digest
# tables are corpus-sized, so no broadcast is claimed); stage survival
# folds into a single aggregate row, and the 6-row
# census unpivots from it — kept_ppm (vs raw) and drop_ppm (vs the
# previous stage) via a 6-row stage self-join, the q69 device. No
# driver-side action; every ratio is integer ppm.
# --------------------------------------------------------------------------
PCF_STAGES = [
    "raw", "exact_dedup", "quality", "lang_en", "holdout", "decontam",
]


def pipe_corpus_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jobx_spark.lineage import cut_lineage
    from jobx_spark.operators.dedup import normalized_digest
    from jobx_spark.operators.text import punct_count, stopword_count

    docs = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    n_toks = F.size(toks).cast("long")
    nospace = F.length(
        F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", "")
    ).cast("long")
    n_distinct = F.size(F.array_distinct(toks)).cast("long")
    r_wordcount = (n_toks >= QR_MIN_TOKENS) & (n_toks <= QR_MAX_TOKENS)
    r_wordlen = (nospace >= QR_MIN_MWL * n_toks) & (
        nospace <= QR_MAX_MWL * n_toks
    )
    r_symbol = (
        punct_count(F.col("text")) * 100
        <= F.length("text").cast("long") * QR_MAX_SYMBOL_PCT
    )
    r_stopword = stopword_count(F.col("text"), "en") >= 1
    r_repetition = n_distinct * 100 >= n_toks * QR_MIN_TTR_PCT
    base = cut_lineage(
        docs.select(
            "doc_id",
            normalized_digest("text").alias("digest"),
            n_toks.alias("n_toks"),
            (
                r_wordcount & r_wordlen & r_symbol & r_stopword
                & r_repetition
            ).alias("q_keep"),
            (F.col("lang") == "en").alias("is_en"),
            (F.col("doc_id") % 10 == 0).alias("is_eval"),
        ),
        "pcf-base",
    )
    keep = base.groupBy("digest").agg(F.min("doc_id").alias("keep_id"))
    eval_digests = (
        base.filter(F.col("is_eval")).select("digest").distinct()
        .withColumn("contaminated", F.lit(True))
    )
    flagged = (
        base.join(keep, "digest")
        .join(eval_digests, "digest", "left")
        .select(
            "n_toks",
            F.lit(True).alias("a1"),
            (F.col("doc_id") == F.col("keep_id")).alias("a2"),
            "q_keep",
            "is_en",
            "is_eval",
            F.coalesce("contaminated", F.lit(False)).alias("contam"),
        )
        .withColumn("a3", F.col("a2") & F.col("q_keep"))
        .withColumn("a4", F.col("a3") & F.col("is_en"))
        .withColumn("a5", F.col("a4") & ~F.col("is_eval"))
        .withColumn("a6", F.col("a5") & ~F.col("contam"))
    )
    aggs = []
    for i in range(1, len(PCF_STAGES) + 1):
        b = F.col(f"a{i}").cast("long")
        aggs.append(F.sum(b).alias(f"d{i}"))
        aggs.append(F.sum(b * F.col("n_toks")).alias(f"t{i}"))
    one = flagged.agg(*aggs)
    stack_expr = ", ".join(
        f"{i + 1}, '{s}', d{i + 1}, t{i + 1}"
        for i, s in enumerate(PCF_STAGES)
    )
    counts = one.select(
        F.expr(
            f"stack({len(PCF_STAGES)}, {stack_expr})"
            " as (stage, name, n_docs, n_tokens)"
        )
    )
    prev = counts.select(
        (F.col("stage") + 1).alias("stage"),
        F.col("n_docs").alias("prev_docs"),
    )
    root = counts.filter(F.col("stage") == 1).select(
        F.greatest(F.col("n_docs"), F.lit(1)).alias("raw_docs")
    )
    return (
        counts.join(prev, "stage", "left")
        .withColumn("prev_docs", F.coalesce("prev_docs", "n_docs"))
        .crossJoin(F.broadcast(root))
        .select(
            F.col("stage").cast("int").alias("stage"),
            "name",
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.expr("(n_docs * 1000000) div raw_docs")
            .cast("long")
            .alias("kept_ppm"),
            F.expr(
                "((prev_docs - n_docs) * 1000000) div greatest(prev_docs, 1)"
            )
            .cast("long")
            .alias("drop_ppm"),
        )
        .orderBy("stage")
    )


def _corpus_funnel_oracle() -> str:
    from jobx_spark.operators.text import LANG_STOPWORDS, PUNCT_CLASS
    from jobx_spark.queries.dedup import _DIGEST

    en = LANG_STOPWORDS["en"]
    names = ", ".join(f"(%d, '%s')" % (i + 1, s)
                      for i, s in enumerate(PCF_STAGES))
    return f"""
WITH base AS (
  SELECT doc_id, {_DIGEST} AS digest,
         CAST(len({_TOKS}) AS BIGINT) AS n_toks,
         CAST(len(regexp_replace(lower(trim(text)), '\\s+', '', 'g')) AS BIGINT) AS nospace,
         CAST(len(list_distinct({_TOKS})) AS BIGINT) AS n_distinct,
         CAST(len(regexp_replace(text, '{PUNCT_CLASS}', '', 'g')) AS BIGINT) AS n_punct,
         CAST(len(text) AS BIGINT) AS n_chars,
         CAST(len(list_intersect({_TOKS}, {en!r})) AS BIGINT) AS n_stop,
         lang = 'en' AS is_en,
         doc_id % 10 = 0 AS is_eval
  FROM documents
), keepmin AS (
  SELECT digest, MIN(doc_id) AS keep_id FROM base GROUP BY digest
), evald AS (
  SELECT DISTINCT digest FROM base WHERE is_eval
), flags AS (
  SELECT b.n_toks,
         TRUE AS a1,
         b.doc_id = k.keep_id AS a2,
         (b.n_toks >= {QR_MIN_TOKENS} AND b.n_toks <= {QR_MAX_TOKENS}
          AND b.nospace >= {QR_MIN_MWL} * b.n_toks
          AND b.nospace <= {QR_MAX_MWL} * b.n_toks
          AND b.n_punct * 100 <= b.n_chars * {QR_MAX_SYMBOL_PCT}
          AND b.n_stop >= 1
          AND b.n_distinct * 100 >= b.n_toks * {QR_MIN_TTR_PCT}) AS qk,
         b.is_en, b.is_eval,
         e.digest IS NOT NULL AS contam
  FROM base b JOIN keepmin k ON k.digest = b.digest
  LEFT JOIN evald e ON e.digest = b.digest
), m AS (
  SELECT n_toks, a1, a2,
         a2 AND qk AS a3,
         a2 AND qk AND is_en AS a4,
         a2 AND qk AND is_en AND NOT is_eval AS a5,
         a2 AND qk AND is_en AND NOT is_eval AND NOT contam AS a6
  FROM flags
), one AS (
  SELECT
    {", ".join(
        f"CAST(SUM(CASE WHEN a{i} THEN 1 ELSE 0 END) AS BIGINT) AS d{i},"
        f" CAST(SUM(CASE WHEN a{i} THEN n_toks ELSE 0 END) AS BIGINT)"
        f" AS t{i}"
        for i in range(1, len(PCF_STAGES) + 1)
    )}
  FROM m
), counts AS (
  SELECT s.stage, s.name,
         CASE s.stage {" ".join(
             f"WHEN {i + 1} THEN d{i + 1}"
             for i in range(len(PCF_STAGES)))} END AS n_docs,
         CASE s.stage {" ".join(
             f"WHEN {i + 1} THEN t{i + 1}"
             for i in range(len(PCF_STAGES)))} END AS n_tokens
  FROM (VALUES {names}) AS s(stage, name), one
), root AS (
  SELECT GREATEST(MAX(CASE WHEN stage = 1 THEN n_docs END), 1)
         AS raw_docs FROM counts
), prevs AS (
  SELECT c.*, COALESCE(LAG(n_docs) OVER (ORDER BY stage), n_docs)
         AS prev_docs
  FROM counts c
)
SELECT CAST(stage AS INTEGER) AS stage, name,
       CAST(n_docs AS BIGINT) AS n_docs,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(n_docs * 1000000 // root.raw_docs AS BIGINT) AS kept_ppm,
       CAST((prev_docs - n_docs) * 1000000 // GREATEST(prev_docs, 1)
            AS BIGINT) AS drop_ppm
FROM prevs, root
ORDER BY stage
"""


# --------------------------------------------------------------------------
# pipe_vocab_build / pipe_encode_serve — the persisted TOKENIZER
# contract, the ann_index_build/serve pattern applied to the other
# train-once family: every pipe_bpe_* query re-runs the BPE learn
# chain inside its own plan (right for a one-statement oracle, wrong
# for production — a tokenizer trains once and ships as an artifact).
#   * pipe_vocab_build runs the learn chain once, persists the merged
#     word table (w, sym, n) and the symbol vocabulary (s, id, cnt —
#     ids ranked weighted-frequency-desc, symbol-asc, the
#     pipe_bpe_encode ordering) as parquet tables under the checkpoint
#     root, and returns the vocabulary census PLANNED OVER THE
#     PERSISTED symbols table (id, symbol, weight, n_chars, is_merged)
#     — the gate hash attests the artifact on disk.
#   * pipe_encode_serve encodes the corpus AGAINST the persisted
#     tables: the word→ids mapping comes from the stored word table,
#     the id map from a bounded collect of the stored symbol table
#     (≤ |chars| + BPE_MERGES rows, declared in collect_contract) —
#     ZERO learn-chain iterations in the serve plan (pinned by test:
#     no bpee-w lineage cuts, the vocab tables are the only non-corpus
#     scans). Output contract identical to pipe_bpe_encode, so the
#     oracle is that query's oracle verbatim — the certificate that
#     persisting the vocabulary changed the execution shape, not the
#     encoding.
# 100 TB story: the learn chain (distinct-word scale) runs once per
# tokenizer release; every corpus encode afterwards is one tokenize
# scan + one word-keyed join against a loaded table.
# --------------------------------------------------------------------------
def _bpe_vocab_paths(sf_dir: str) -> tuple[str, str]:
    import hashlib
    import os

    from jobx_spark.lineage import checkpoint_root

    key = hashlib.sha256(sf_dir.rstrip("/").encode()).hexdigest()[:12]
    root = os.path.join(checkpoint_root(), f"bpe-vocab-{key}")
    return os.path.join(root, "words"), os.path.join(root, "symbols")


def _bpe_vocab_write(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    from pyspark.sql import Window as W

    wpath, spath = _bpe_vocab_paths(sf_dir)
    words = _bpe_learned_words(spark, sf_dir)
    words.write.mode("overwrite").parquet(wpath)
    stored = spark.read.parquet(wpath)
    symv = (
        stored.select(
            F.explode(F.split("sym", _BPE_SEP)).alias("s"), "n"
        )
        .groupBy("s")
        .agg(F.sum("n").alias("cnt"))
    )
    # global rank over the aggregated symbol table: ≤ |chars| +
    # BPE_MERGES rows by construction (declared in window_contract)
    wrank = W.partitionBy().orderBy(F.desc("cnt"), F.asc("s"))
    (
        symv.withColumn("id", F.row_number().over(wrank).cast("long"))
        .write.mode("overwrite")
        .parquet(spath)
    )
    return wpath, spath


def _bpe_vocab_ensure(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    import os

    from jobx_spark import artifacts as A

    wpath, spath = _bpe_vocab_paths(sf_dir)
    if not (
        A.fs_exists(spark, os.path.join(wpath, "_SUCCESS"))
        and A.fs_exists(spark, os.path.join(spath, "_SUCCESS"))
    ):
        _bpe_vocab_write(spark, sf_dir)
    return wpath, spath


def pipe_vocab_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, spath = _bpe_vocab_write(spark, sf_dir)
    return (
        spark.read.parquet(spath)
        .select(
            "id",
            F.col("s").alias("symbol"),
            F.col("cnt").cast("long").alias("weight"),
            F.length("s").cast("long").alias("n_chars"),
            (F.length("s") > 1).cast("long").alias("is_merged"),
        )
        .orderBy("id")
    )


def _vocab_build_oracle() -> str:
    n = BPE_MERGES
    body = ",\n".join(_bpe_chain_parts())
    return f"""
WITH {body},
symv AS (
  SELECT s, CAST(SUM(n) AS BIGINT) AS cnt
  FROM (SELECT unnest(string_split(sym, chr(31))) AS s, n FROM e{n})
  GROUP BY s
)
SELECT CAST(row_number() OVER (ORDER BY cnt DESC, s ASC) AS BIGINT) AS id,
       s AS symbol, cnt AS weight,
       CAST(len(s) AS BIGINT) AS n_chars,
       CAST(CASE WHEN len(s) > 1 THEN 1 ELSE 0 END AS BIGINT) AS is_merged
FROM symv
ORDER BY id
"""


def pipe_encode_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    wpath, spath = _bpe_vocab_ensure(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    words = spark.read.parquet(wpath)
    # the id map from the persisted symbol table: ≤ |chars| +
    # BPE_MERGES rows by construction (declared in collect_contract)
    sym_id = {
        r["s"]: int(r["id"])
        for r in spark.read.parquet(spath).collect()
    }
    return _bpe_encode_body(docs, words, sym_id)


QUERIES = {
    "pipe_corpus_funnel": pipe_corpus_funnel,
    "pipe_vocab_build": pipe_vocab_build,
    "pipe_encode_serve": pipe_encode_serve,
    "pipe_bpe_decode": pipe_bpe_decode,
    "pipe_bpe_encode": pipe_bpe_encode,
    "pipe_quantile_sketch": pipe_quantile_sketch,
    "pipe_skew_census": pipe_skew_census,
    "pipe_shuffle_audit": pipe_shuffle_audit,
    "pipe_quality_funnel": pipe_quality_funnel,
    "pipe_t_closeness": pipe_t_closeness,
    "pipe_dataset_card": pipe_dataset_card,
    "pipe_pack_sequences": pipe_pack_sequences,
    "pipe_dsir_sample": pipe_dsir_sample,
    "pipe_snapshot_diff": pipe_snapshot_diff,
    "pipe_k_anonymity": pipe_k_anonymity,
    "pipe_l_diversity": pipe_l_diversity,
    "pipe_dp_release": pipe_dp_release,
    "pipe_watermark_lateness": pipe_watermark_lateness,
    "pipe_epochs_budget": pipe_epochs_budget,
    "pipe_unimax_mixing": pipe_unimax_mixing,
    "pipe_curriculum_order": pipe_curriculum_order,
    "pipe_padding_waste": pipe_padding_waste,
    "pipe_ewma_user_value": pipe_ewma_user_value,
    "pipe_quality_rules": pipe_quality_rules,
    "pipe_mix_temperature": pipe_mix_temperature,
    "pipe_shard_assign": pipe_shard_assign,
    "pipe_bpe_learn": pipe_bpe_learn,
    "pipe_sample_weighted": pipe_sample_weighted,
    "pipe_encode_ids": pipe_encode_ids,
    "pipe_sample_hash": pipe_sample_hash,
    "pipe_sample_join": pipe_sample_join,
    "pipe_split_train_val_test": pipe_split_train_val_test,
    "pipe_corpus_stats": pipe_corpus_stats,
    "pipe_vocab_topk": pipe_vocab_topk,
    "pipe_bigram_counts": pipe_bigram_counts,
    "pipe_length_buckets": pipe_length_buckets,
    "pipe_pack_offsets": pipe_pack_offsets,
    "pipe_bpe_token_count": pipe_bpe_token_count,
    "pipe_tokenizer_fertility": pipe_tokenizer_fertility,
    "pipe_gapfill_hours": pipe_gapfill_hours,
    "pipe_rollup_reagg": pipe_rollup_reagg,
    "pipe_minmax_scale": pipe_minmax_scale,
    "pipe_mix_weighted": pipe_mix_weighted,
    "pipe_text_chunks": pipe_text_chunks,
    "pipe_clean_corpus": pipe_clean_corpus,
    "pipe_blocklist_scrub": pipe_blocklist_scrub,
    "pipe_manifest": pipe_manifest,
    "pipe_table_diff": pipe_table_diff,
    "pipe_sample_fixed_k": pipe_sample_fixed_k,
    "pipe_pii_scrub": pipe_pii_scrub,
    "pipe_corpus_build": pipe_corpus_build,
    "pipe_stratified_k": pipe_stratified_k,
}

ORACLES = {
    "pipe_corpus_funnel": _corpus_funnel_oracle(),
    "pipe_vocab_build": _vocab_build_oracle(),
    # identical output contract to the learn-in-plan encode — the
    # persisted-vocabulary serve attests the same encoding
    "pipe_encode_serve": _bpe_encode_oracle(),
    "pipe_bpe_decode": _bpe_decode_oracle(),
    "pipe_bpe_encode": _bpe_encode_oracle(),
    "pipe_quantile_sketch": _quantile_sketch_oracle(),
    "pipe_skew_census": ORACLE_PIPE_SKEW_CENSUS,
    "pipe_shuffle_audit": ORACLE_PIPE_SHUFFLE_AUDIT,
    "pipe_quality_funnel": _quality_funnel_oracle(),
    "pipe_t_closeness": ORACLE_PIPE_T_CLOSENESS,
    "pipe_dataset_card": ORACLE_PIPE_DATASET_CARD,
    "pipe_pack_sequences": ORACLE_PIPE_PACK_SEQUENCES,
    "pipe_dsir_sample": ORACLE_PIPE_DSIR_SAMPLE,
    "pipe_snapshot_diff": ORACLE_PIPE_SNAPSHOT_DIFF,
    "pipe_k_anonymity": ORACLE_PIPE_K_ANONYMITY,
    "pipe_l_diversity": ORACLE_PIPE_L_DIVERSITY,
    "pipe_dp_release": _dp_release_oracle(),
    "pipe_watermark_lateness": _watermark_lateness_oracle(),
    "pipe_epochs_budget": ORACLE_PIPE_EPOCHS_BUDGET,
    "pipe_unimax_mixing": _unimax_oracle(),
    "pipe_curriculum_order": ORACLE_PIPE_CURRICULUM,
    "pipe_padding_waste": _padding_waste_oracle(),
    "pipe_ewma_user_value": ORACLE_PIPE_EWMA,
    "pipe_quality_rules": _quality_rules_oracle(),
    "pipe_mix_temperature": ORACLE_PIPE_MIX_TEMPERATURE,
    "pipe_shard_assign": ORACLE_PIPE_SHARD_ASSIGN,
    "pipe_bpe_learn": _bpe_learn_oracle(),
    "pipe_sample_weighted": ORACLE_PIPE_SAMPLE_WEIGHTED,
    "pipe_encode_ids": ORACLE_PIPE_ENCODE,
    "pipe_sample_hash": ORACLE_PIPE_SAMPLE,
    "pipe_sample_join": ORACLE_PIPE_SAMPLE_JOIN,
    "pipe_split_train_val_test": ORACLE_PIPE_SPLIT,
    "pipe_corpus_stats": ORACLE_PIPE_CORPUS_STATS,
    "pipe_vocab_topk": ORACLE_PIPE_VOCAB,
    "pipe_bigram_counts": ORACLE_PIPE_BIGRAMS,
    "pipe_length_buckets": ORACLE_PIPE_LENGTH_BUCKETS,
    "pipe_pack_offsets": ORACLE_PIPE_PACK,
    "pipe_bpe_token_count": ORACLE_PIPE_BPE,
    "pipe_tokenizer_fertility": ORACLE_PIPE_TOKENIZER_FERTILITY,
    "pipe_gapfill_hours": ORACLE_PIPE_GAPFILL,
    "pipe_rollup_reagg": ORACLE_PIPE_ROLLUP_REAGG,
    "pipe_minmax_scale": ORACLE_PIPE_MINMAX,
    "pipe_mix_weighted": ORACLE_PIPE_MIX,
    "pipe_text_chunks": ORACLE_PIPE_CHUNKS,
    "pipe_clean_corpus": _clean_corpus_oracle(),
    "pipe_blocklist_scrub": ORACLE_PIPE_BLOCKLIST,
    "pipe_manifest": ORACLE_PIPE_MANIFEST,
    "pipe_table_diff": ORACLE_PIPE_DIFF,
    "pipe_sample_fixed_k": ORACLE_PIPE_SAMPLE_FIXED_K,
    "pipe_pii_scrub": _pii_oracle(),
    "pipe_corpus_build": _corpus_build_oracle(),
    "pipe_stratified_k": ORACLE_PIPE_STRATIFIED_K,
}
