"""Distributed cardinality / membership sketches built from pure
column algebra — no UDFs, no driver state, and (deliberately) no
arrival-order dependence, so every sketch here is bit-reproducible in
SQL and safe to merge across any cluster layout.

Reference parity note: the reference engine has no sketch library at
all — its only aggregation is a user-written reducer over a grouped
value list (mr/job_engine.py reduce path). These operators are part of
the LLM-pipeline surface this engine adds on top: at 100 TB you count
distinct tokens with an HLL (64 registers, mergeable, one map-side
combinable groupBy) and pre-filter a fact-table join with a Bloom
filter (ship kilobits, not the dimension table) rather than with exact
structures.

Like the Count-Min sketch in :mod:`jobx_spark.operators.text`, both
sketches use commutative/idempotent combine steps (MAX for HLL
registers, set-union for Bloom bits), so the sketch state is identical
no matter how Spark partitions the input — which is exactly what makes
them oracle-verifiable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from jobx_spark.functions import md5_long

# ------------------------------------------------------------- hyperloglog
# 60-bit portable hash → low 6 bits pick one of M=64 registers, the
# remaining 54 bits feed the leading-zero rank rho ∈ [1, 55].
HLL_M = 64
HLL_P = 6  # log2(HLL_M)
HLL_WBITS = 60 - HLL_P  # width of the rank field
# alpha_64 * m^2 * 2^WBITS+1 pre-folded into one double constant so both
# engines evaluate ONE multiply-free literal (float multiplication
# order would otherwise have to match exactly).
HLL_ALPHA = 0.709
HLL_EST_NUM = HLL_ALPHA * HLL_M * HLL_M * float(1 << (HLL_WBITS + 1))


def hll_rho(w: Column) -> Column:
    """Leading-zero rank of the 54-bit field ``w``: position of the
    highest set bit, counted from the left, plus one. ``bin()`` strips
    leading zeros in both Spark (Long.toBinaryString) and DuckDB, so
    ``rho = (WBITS + 1) - length(bin(w))`` — with the all-zero field
    mapping to the maximum rank WBITS + 1."""
    return F.when(w == 0, F.lit(HLL_WBITS + 1)).otherwise(
        F.lit(HLL_WBITS + 1) - F.length(F.bin(w))
    ).cast("int")


def hll_registers(df: DataFrame, col: str, salt: str = "hll:") -> DataFrame:
    """Dense HLL register table ``(register INT, max_rho INT)`` — all
    HLL_M rows, untouched registers at 0.

    One shuffle: the groupBy(register).max partial-aggregates map-side,
    so each task ships at most 64 rows regardless of input size; the
    register table is the sketch and unions of sketches merge with the
    same MAX. The range(64) left join densifies on the driver-side tiny
    dimension (broadcast)."""
    spark = df.sparkSession
    h = md5_long(F.concat(F.lit(salt), F.col(col).cast("string")))
    touched = (
        df.select(h.alias("h"))
        .select(
            F.pmod(F.col("h"), F.lit(HLL_M)).cast("int").alias("register"),
            F.shiftright(F.col("h"), HLL_P).alias("w"),
        )
        .select("register", hll_rho(F.col("w")).alias("rho"))
        .groupBy("register")
        .agg(F.max("rho").alias("max_rho"))
    )
    dense = spark.range(HLL_M).select(F.col("id").cast("int").alias("register"))
    return (
        dense.join(F.broadcast(touched), "register", "left")
        .select("register", F.coalesce("max_rho", F.lit(0)).alias("max_rho"))
    )


def hll_estimate(registers: DataFrame) -> DataFrame:
    """Raw HLL estimate from a dense register table, as one row
    ``(hll_est DOUBLE, zero_registers BIGINT)``.

    The harmonic mean is computed exactly in integers — each register
    contributes ``2^(WBITS+1 - max_rho)`` (≤ 64 · 2^55 < 2^63, no
    overflow) — and only the final single division happens in floating
    point. int64→double conversion and IEEE division are both correctly
    rounded, so the estimate is bit-identical across engines. No
    small/large-range correction: ``log`` is libm-dependent, so the
    linear-counting branch would break cross-engine determinism; the
    raw estimator is the contract (callers get zero_registers to apply
    their own correction)."""
    return registers.agg(
        (
            F.lit(HLL_EST_NUM)
            # shiftleft's bit-count must be a Column here, which the
            # classic DataFrame API doesn't accept — the SQL form does.
            / F.sum(
                F.expr(f"shiftleft(CAST(1 AS BIGINT), {HLL_WBITS + 1} - max_rho)")
            ).cast("double")
        ).alias("hll_est"),
        F.sum((F.col("max_rho") == 0).cast("long")).alias("zero_registers"),
    )


def hll_sql(toks_cte: str, md5_tpl: str, salt: str = "hll:") -> str:
    """DuckDB rendering of registers+estimate over a one-column CTE
    ``{toks_cte}(v VARCHAR)`` — construct-for-construct the same
    algebra (``>> 6``, ``bin`` length, integer shifts, one division)."""
    h = md5_tpl.format(e=f"('{salt}' || v)")
    wb1 = HLL_WBITS + 1
    return f"""
hashed AS (SELECT {h} AS h FROM {toks_cte}),
touched AS (
  SELECT CAST(h % {HLL_M} AS INTEGER) AS register,
         MAX(CASE WHEN (h >> {HLL_P}) = 0 THEN {wb1}
                  ELSE {wb1} - length(bin(h >> {HLL_P})) END) AS max_rho
  FROM hashed GROUP BY 1
),
regs AS (
  SELECT CAST(r.range AS INTEGER) AS register,
         CAST(COALESCE(t.max_rho, 0) AS INTEGER) AS max_rho
  FROM range({HLL_M}) r LEFT JOIN touched t ON t.register = r.range
),
est AS (
  SELECT {HLL_EST_NUM!r} / CAST(SUM(1::BIGINT << ({wb1} - max_rho)) AS DOUBLE)
             AS hll_est,
         CAST(SUM(CASE WHEN max_rho = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS zero_registers
  FROM regs
)"""


# ------------------------------------------------------------ bloom filter
# The filter is represented as its SET OF SET BIT POSITIONS — a tiny
# DataFrame (≤ k·n rows for n keys), broadcast to the probe side. At
# 100 TB this is the point: the dimension's membership ships as
# kilobits of positions instead of the keys themselves, and the probe
# is a broadcast join that never shuffles the fact table.
BF_BITS = 4096
BF_K = 3


def bloom_positions(keys: DataFrame, col: str, bits: int = BF_BITS, k: int = BF_K) -> DataFrame:
    """Distinct bit positions set by ``keys[col]``: one row per set bit
    (column ``pos INT``). Union of position tables = union of filters."""
    pos = [
        F.pmod(
            md5_long(F.concat(F.lit(f"bf{i}:"), F.col(col).cast("string"))),
            F.lit(bits),
        ).cast("int")
        for i in range(k)
    ]
    return (
        keys.select(F.explode(F.array(*pos)).alias("pos")).distinct()
    )


def bloom_probe(probe: DataFrame, col: str, positions: DataFrame,
                bits: int = BF_BITS, k: int = BF_K) -> DataFrame:
    """Keys of ``probe[col]`` that PASS the filter (all k positions
    set). May contain false positives — never false negatives — so a
    passed set is safe to feed an exact residual join.

    Duplicate positions within one key's k hashes are deduplicated and
    the pass test compares matched-distinct-positions against that
    key's own distinct-position count (not k), so a self-colliding key
    is still judged correctly."""
    pos = [
        F.pmod(
            md5_long(F.concat(F.lit(f"bf{i}:"), F.col("key").cast("string"))),
            F.lit(bits),
        ).cast("int")
        for i in range(k)
    ]
    key_pos = (
        probe.select(F.col(col).alias("key"))
        .distinct()
        .select("key", F.explode(F.array_distinct(F.array(*pos))).alias("pos"))
    )
    tot = key_pos.groupBy("key").agg(F.count("*").alias("n_pos"))
    hit = (
        key_pos.join(F.broadcast(positions), "pos", "left_semi")
        .groupBy("key")
        .agg(F.count("*").alias("n_hit"))
    )
    return (
        tot.join(hit, "key", "left")
        .filter(F.coalesce(F.col("n_hit"), F.lit(0)) == F.col("n_pos"))
        .select("key")
    )
