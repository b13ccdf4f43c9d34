"""Skew-handling operators: salted two-phase aggregation and salted
joins.

AQE's skew-join splitting (enabled in jobx_spark.session) handles most
runtime skew automatically; these are the *explicit* constructions for
the cases AQE can't fix — a single hot grouping key whose partial
aggregate is itself too big for one task, or a join where one key holds
a double-digit percentage of all rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, Column],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation with an explicit salt.

    Phase 1 groups by (keys..., salt) — the hot key's rows spread over
    ``n_salts`` tasks; phase 2 re-aggregates the per-salt partials by
    the real keys. ``aggs`` maps output column name → phase-1 aggregate
    expression; phase 2 recombines with the matching merge function
    (SUM for sums/counts, MIN/MAX for min/max).

    Only decomposable aggregates are accepted — exactly the ones whose
    partial/final split Spark itself uses for map-side combine. The
    salt column derives from a hash of the full row partition, not
    rand(), so retried tasks re-produce identical salts (determinism
    under task retry).
    """
    merge_fn = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    salted = df.withColumn(
        "_salt", F.pmod(F.spark_partition_id() + F.monotonically_increasing_id(), n_salts)
    )
    phase1 = salted.groupBy(*keys, "_salt").agg(
        *[expr.alias(f"_p_{name}") for name, expr in aggs.items()]
    )
    finals = []
    for name, expr in aggs.items():
        # expr's first token names the aggregate (e.g. sum(...)); pick
        # the matching merge. Callers pass F.sum/F.count/F.min/F.max.
        fn_name = str(expr._jc).split("(", 1)[0].strip().lower()
        merge = merge_fn.get(fn_name, F.sum)
        finals.append(merge(f"_p_{name}").alias(name))
    return phase1.groupBy(*keys).agg(*finals)


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join a skewed fact side against a dimension by replicating the
    dimension ``n_salts`` times: fact rows get a deterministic salt in
    [0, n_salts); each dim row is exploded to all salts; the join runs
    on (key, salt), splitting the hot key across tasks.

    Use when the dimension is too large to broadcast but small enough
    to replicate ``n_salts``×; otherwise prefer AQE skew-join.
    """
    salted_fact = skewed.withColumn(
        "_salt",
        F.pmod(F.xxhash64(F.col(on), F.spark_partition_id(), F.monotonically_increasing_id()), F.lit(n_salts)),
    )
    replicated = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("_salt", F.col("_salt").cast(salted_fact.schema["_salt"].dataType))
    return salted_fact.join(replicated, [on, "_salt"], how).drop("_salt")
