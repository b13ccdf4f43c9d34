"""Text-analysis operators: tokenization, n-gram shingles, quality
stats, language-ID heuristic, token counting, document fingerprinting.

Everything here is either pure ``pyspark.sql.functions`` column algebra
(whole-stage codegen, scan-shaped, zero shuffles — all per-row) or, for
the gram/shingle hot path, an Arrow-batched ``mapInPandas`` producer
(``gram_rows``) that fuses tokenize → n-gram → distinct → hash at
C speed per batch; no row-at-a-time Python UDFs anywhere.

Determinism contract: every operator is reproducible bit-for-bit in
ANSI SQL (see jobx_spark/queries/text.py for the DuckDB renderings) —
hashing is the portable md5-60bit scheme from jobx_spark.functions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from jobx_spark.functions import md5_long

FINGERPRINT_MOD = 1_000_000_007

# tiny embedded stopword lists for the language-ID heuristic; a real
# deployment would broadcast larger lexicons — the operator shape
# (per-row score → argmax) is the same.
LANG_STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is"],
    "es": ["el", "la", "de", "y", "que", "los", "es"],
    "de": ["der", "die", "das", "und", "ist", "ein", "zu"],
    "fr": ["le", "la", "de", "et", "les", "des", "un"],
}
PUNCT_CLASS = "[^.,!?;:]"


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization of lower-cased trimmed text."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.lower(F.trim(c)), r"\s+")


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col)).cast("bigint")


def shingles(col: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles as space-joined strings (1-indexed slices —
    the construction DuckDB's list_slice mirrors exactly)."""
    toks = tokens(col)
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(0))),
        lambda i: F.array_join(F.slice(toks, i, n), " "),
    )


def gram_rows(
    df: DataFrame,
    id_cols: list[str],
    text_col: str = "text",
    ns: tuple[int, ...] = (3,),
    distinct: bool = False,
    prefix: str = "",
    emit: str = "hash",
    with_pos: bool = False,
) -> DataFrame:
    """Exploded word-n-gram rows computed at the Arrow boundary — the
    fused, batch-vectorized form of
    ``explode([array_distinct(]shingles(text, n)[)])`` [``+ md5_long``].

    The column-algebra ``shingles`` builds each gram through a
    higher-order ``transform`` lambda, which is CodegenFallback: every
    gram pays an INTERPRETED slice + array_join (~16 µs/gram measured at
    sf0.1 — ~95% of the whole shingle pass; the md5 itself is codegen
    and cheap). Here one ``mapInPandas`` pass tokenizes, builds grams,
    (optionally) set-dedups per doc and hashes per Arrow batch at
    C speed (guide §4.2: hand whole batches to native code). Values are
    bit-identical: tokenization mirrors ``split(lower(trim(text)),
    '\\s+')`` exactly (ASCII-space trim, ASCII ``\\s`` class, Java
    split's leading-empty behavior, ``['']`` for empty text) and the
    hash is the same md5-hex-15 → base-10 BIGINT. Grams of multiple
    ``ns`` concatenate in order (the DSIR unigram+bigram shape).

    emit='hash' → column ``h`` (long, md5_long of prefix+gram);
    emit='gram' → column ``g`` (the gram string). ``with_pos`` adds the
    0-based ``pos`` of ``posexplode`` (single-n, non-distinct callers).
    Docs whose token count is below every ``n`` produce no rows — such
    docs never produce grams in the column form either (and <n-token
    docs would actually *crash* the 1-indexed slice there, so no green
    query can contain one).
    """
    import hashlib
    import re as _re

    import pandas as pd
    from pyspark.sql.types import LongType, StructField, StructType

    ws = _re.compile(r"\s+", _re.ASCII)
    ns_t = tuple(ns)
    src = df.select(*id_cols, text_col)
    # Scale-adaptive parallelism guard: a small input (one parquet
    # split) would otherwise run the whole gram pass as ONE task and
    # hand every consumer a 1-partition table. When the scan has fewer
    # splits than cores, spread the docs round-robin (deterministic —
    # sort-before-repartition is on by default); at production scale
    # the scan already has >> cores partitions and this never fires.
    para = df.sparkSession.sparkContext.defaultParallelism
    if src.rdd.getNumPartitions() < para:
        src = src.repartition(para)
    fields = [src.schema[c] for c in id_cols]
    if with_pos:
        fields.append(StructField("pos", LongType(), False))
    if emit == "hash":
        fields.append(StructField("h", LongType(), False))
    else:
        from pyspark.sql.types import StringType

        fields.append(StructField("g", StringType(), False))
    schema = StructType(fields)

    def gen(batches):
        md5 = hashlib.md5
        for pdf in batches:
            idx: list[int] = []
            poss: list[int] = []
            out: list = []
            for i, txt in enumerate(pdf[text_col]):
                if txt is None:
                    continue
                toks = ws.split(txt.strip(" ").lower())
                grams: list[str] = []
                for n in ns_t:
                    if n == 1:
                        grams.extend(toks)
                    else:
                        m = len(toks) - (n - 1)
                        grams.extend(
                            " ".join(toks[j : j + n]) for j in range(m)
                        )
                if distinct:
                    grams = list(dict.fromkeys(grams))
                if with_pos:
                    poss.extend(range(len(grams)))
                idx.extend([i] * len(grams))
                if emit == "hash":
                    out.extend(
                        int(md5((prefix + s).encode("utf-8")).hexdigest()[:15], 16)
                        for s in grams
                    )
                else:
                    out.extend(grams)
            res = pdf.iloc[idx, [pdf.columns.get_loc(c) for c in id_cols]]
            res = res.reset_index(drop=True)
            if with_pos:
                res["pos"] = pd.array(poss, dtype="int64")
            if emit == "hash":
                res["h"] = pd.array(out, dtype="int64")
            else:
                res["g"] = pd.Series(out, dtype="object")
            yield res

    return src.mapInPandas(gen, schema)


def char_gram_counts(
    df: DataFrame,
    id_cols: list[str],
    text_col: str = "text",
    n: int = 3,
    min_len: int | None = None,
) -> DataFrame:
    """Per-document character n-gram COUNTS computed at the Arrow
    boundary — the fused, batch-vectorized form of
    ``explode(transform(sequence(1, length(lt) - n + 1),
    i -> substring(lt, i, n)))`` (CodegenFallback: every char-gram paid
    an interpreted substring — the word-shingle pathology gram_rows
    fixed, recurring on the character alphabet) PLUS the per-(doc,
    gram) aggregation: one row per distinct gram per doc with its
    occurrence count ``c``, so a consumer gets the full gram stream
    (Σ c) and the per-doc distinct set (the rows) from ONE pass and no
    corpus-wide distinct shuffle.

    Case-lowering stays JVM-side (``F.lower``): Python's str.lower can
    disagree with JVM/DuckDB lowering on exotic codepoints, and the
    oracle contract is lower() semantics. Slicing is pure unicode
    character indexing on both engines. Docs shorter than ``min_len``
    (default n) produce no rows, mirroring the length(text) >= n guard
    of the column form."""
    import pandas as pd
    from collections import Counter
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    if min_len is None:
        min_len = n
    src = df.filter(F.length(text_col) >= min_len).select(
        *id_cols, F.lower(F.col(text_col)).alias("_lt")
    )
    para = df.sparkSession.sparkContext.defaultParallelism
    if src.rdd.getNumPartitions() < para:
        src = src.repartition(para)
    fields = [src.schema[c] for c in id_cols]
    fields.append(StructField("g", StringType(), False))
    fields.append(StructField("c", LongType(), False))
    schema = StructType(fields)

    def gen(batches):
        for pdf in batches:
            idx: list[int] = []
            gs: list[str] = []
            cs: list[int] = []
            for i, lt in enumerate(pdf["_lt"]):
                if lt is None:
                    continue
                m = len(lt) - n + 1
                if m <= 0:
                    continue
                cnt = Counter(lt[j : j + n] for j in range(m))
                idx.extend([i] * len(cnt))
                gs.extend(cnt.keys())
                cs.extend(cnt.values())
            res = pdf.iloc[idx, [pdf.columns.get_loc(c) for c in id_cols]]
            res = res.reset_index(drop=True)
            res["g"] = pd.Series(gs, dtype="object")
            res["c"] = pd.array(cs, dtype="int64")
            yield res

    return src.mapInPandas(gen, schema)


def para_rows(
    df: DataFrame,
    id_cols: list[str],
    text_col: str = "text",
    width: int = 4,
    prefix: str = "para:",
) -> DataFrame:
    """Exploded paragraph-line rows computed at the Arrow boundary —
    the fused, batch-vectorized form of the blank-line-split →
    normalize → ``width``-token line split → md5 chain
    ``dedup_paragraphs`` previously built from NESTED higher-order
    ``transform`` lambdas (CodegenFallback: every line paid an
    interpreted slice + array_join, the same ~16 µs/gram pathology
    :func:`gram_rows` removed from the shingle paths).

    Values are bit-identical to the column form: blocks =
    ``split(text, '\\n\\s*\\n')`` (ASCII classes, Java split's
    empty-segment behavior), per block ``regexp_replace(lower(trim(b)),
    '\\s+', ' ')`` then single-space split, lines = 1-indexed
    ``width``-token slices space-joined (empty block → one empty line,
    exactly like the expression form), ``idx`` = the 0-based
    ``posexplode`` position across the flattened lines, ``ph`` = the
    md5-hex-15 → BIGINT of ``prefix + line``, ``plen`` = character
    length. NULL text emits no rows (posexplode-of-NULL semantics).

    Output: (*id_cols, idx int, ph long, plen long) — the line string
    itself never crosses back over the boundary (consumers only need
    its hash and length).
    """
    import hashlib
    import re as _re

    import pandas as pd
    from pyspark.sql.types import IntegerType, LongType, StructField, StructType

    blk = _re.compile(r"\n\s*\n", _re.ASCII)
    ws = _re.compile(r"\s+", _re.ASCII)
    src = df.select(*id_cols, text_col)
    # same scale-adaptive small-input spread as gram_rows (never fires
    # once the scan has >= cores splits — i.e. never at production scale)
    para = df.sparkSession.sparkContext.defaultParallelism
    if src.rdd.getNumPartitions() < para:
        src = src.repartition(para)
    fields = [src.schema[c] for c in id_cols] + [
        StructField("idx", IntegerType(), False),
        StructField("ph", LongType(), False),
        StructField("plen", LongType(), False),
    ]
    schema = StructType(fields)

    def gen(batches):
        md5 = hashlib.md5
        for pdf in batches:
            ridx: list[int] = []
            idxs: list[int] = []
            phs: list[int] = []
            plens: list[int] = []
            for i, txt in enumerate(pdf[text_col]):
                if txt is None:
                    continue
                k = 0
                for b in blk.split(txt):
                    toks = ws.sub(" ", b.strip(" ").lower()).split(" ")
                    for j in range((len(toks) + width - 1) // width):
                        p = " ".join(toks[j * width : (j + 1) * width])
                        ridx.append(i)
                        idxs.append(k)
                        k += 1
                        phs.append(
                            int(
                                md5((prefix + p).encode("utf-8"))
                                .hexdigest()[:15],
                                16,
                            )
                        )
                        plens.append(len(p))
            res = pdf.iloc[ridx, [pdf.columns.get_loc(c) for c in id_cols]]
            res = res.reset_index(drop=True)
            res["idx"] = pd.array(idxs, dtype="int32")
            res["ph"] = pd.array(phs, dtype="int64")
            res["plen"] = pd.array(plens, dtype="int64")
            yield res

    return src.mapInPandas(gen, schema)


def punct_count(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.length(F.regexp_replace(c, PUNCT_CLASS, "")).cast("bigint")


def stopword_count(col: Column | str, lang: str = "en") -> Column:
    toks = tokens(col)
    words = F.array(*[F.lit(w) for w in LANG_STOPWORDS[lang]])
    return F.size(F.array_intersect(toks, words)).cast("bigint")


def quality_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword / mean-token-length features —
    the standard cheap quality filters of a training-data pipeline.
    Ratios are double divisions of exact integers (deterministic)."""
    c = F.col(text_col)
    n_chars = F.length(c).cast("bigint")
    n_toks = token_count(c)
    return df.withColumns(
        {
            "n_chars": n_chars,
            "n_tokens": n_toks,
            "n_punct": punct_count(c),
            "punct_ratio": punct_count(c).cast("double") / n_chars,
            "stopword_ratio": stopword_count(c).cast("double") / n_toks,
            "mean_token_len": (
                F.length(F.regexp_replace(F.lower(F.trim(c)), r"\s+", "")).cast("double")
                / n_toks
            ),
        }
    )


def lang_scores(col: Column | str) -> dict[str, Column]:
    """Per-language stopword-hit counts (the n-gram/lexicon heuristic's
    scoring half)."""
    return {lang: stopword_count(col, lang) for lang in sorted(LANG_STOPWORDS)}


def lang_guess(col: Column | str) -> Column:
    """Argmax over language scores; ties resolve lexicographically
    (deterministic). 'und' when no stopword hits at all."""
    scores = lang_scores(col)
    best = F.greatest(*scores.values())
    expr = F.lit("und")
    for lang in sorted(LANG_STOPWORDS, reverse=True):
        expr = F.when((scores[lang] == best) & (best > 0), F.lit(lang)).otherwise(expr)
    return expr


def fingerprint(col: Column | str) -> Column:
    """Order-sensitive rolling document fingerprint: polynomial fold of
    per-token portable hashes mod 1e9+7. Content-defined, so identical
    documents collide regardless of file/partition placement — the
    cheap first pass of exact dedup at scale."""
    return F.aggregate(
        tokens(col),
        F.lit(0).cast("long"),
        lambda acc, tok: (acc * 31 + md5_long(tok)) % FINGERPRINT_MOD,
    )


# ------------------------------------------------------------ count-min sketch
CMS_DEPTH, CMS_WIDTH = 4, 256


def cms_counters(
    df: DataFrame,
    text_col: str = "text",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Count-Min sketch over the token stream: (r, bucket, c) counters,
    ``depth`` hash rows × ``width`` buckets.

    CMS is THE mergeable frequency sketch for 100 TB streams — and
    unlike quantile or heavy-hitter sketches whose state depends on
    arrival order, its counters are pure sums, so the sketch is
    partition- and order-independent: the same depth×width table comes
    out of any cluster layout, which is what makes it exactly
    reproducible in SQL. The groupBy partial-aggregates map-side, so
    each task ships at most depth·width counter rows regardless of
    input size; estimates are ``min_r counter[r][h_r(x)]`` and only
    ever overcount (by ≤ n/width in expectation per row).
    """
    tok = df.select(F.explode(tokens(F.col(text_col))).alias("tok"))
    hashed = tok.select(
        "tok",
        F.explode(F.array(*[F.lit(r) for r in range(depth)])).alias("r"),
    ).select(
        "r",
        F.pmod(
            md5_long(
                F.concat(F.col("r").cast("string"), F.lit(":"), F.col("tok"))
            ),
            F.lit(width),
        ).alias("bucket"),
    )
    return hashed.groupBy("r", "bucket").agg(F.count("*").alias("c"))


def cms_bucket(tok_col: Column, r_col: Column, width: int = CMS_WIDTH) -> Column:
    """The sketch's hash: bucket of token `tok_col` in row `r_col`."""
    return F.pmod(
        md5_long(F.concat(r_col.cast("string"), F.lit(":"), tok_col)),
        F.lit(width),
    )
