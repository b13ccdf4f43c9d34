"""TB-scale wave regression guard (VERDICT r3 item 8): a synthetic
10⁸-row aggregation + a 10⁸-row broadcast-join pair generated on the
fly (spark.range — no parquet, pure codegen), executed under the
runtime-settable subset of ``cluster_conf(100 TB)``.

What this pins down, against future regressions of the 100× claims:

  * the plans COMPLETE with a deliberately over-provisioned static
    shuffle partition count (2048 — the cluster-shaped number, not the
    32 the local box would pick), because hash aggregation spills
    transparently rather than OOMing;
  * AQE coalesces those 2048 post-shuffle partitions down to the few
    the data actually needs (the final adaptive plan carries an
    AQEShuffleRead with coalesced reads) — the mechanism the §9
    playbook relies on to make one static conf survive 100× data
    drift;
  * the dimension join picks BroadcastHashJoin from cluster_conf's
    raised autoBroadcastJoinThreshold alone (no hint) — at 100 TB the
    broadcast is what removes the full fact-side exchange;
  * results are bit-exact against closed forms, so completion is never
    silently wrong.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from jobx_spark import plans as P
from jobx_spark.cluster import TB, cluster_conf

N = 100_000_000
MOD = 97
GROUPS = 1_000_000

# the runtime-settable subset of the 100 TB conf (static/cluster-size
# keys like files.maxPartitionBytes or serializer need a new JVM)
_RUNTIME_KEYS = (
    "spark.sql.adaptive.enabled",
    "spark.sql.adaptive.coalescePartitions.enabled",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes",
    "spark.sql.adaptive.skewJoin.enabled",
    "spark.sql.autoBroadcastJoinThreshold",
)


@pytest.fixture()
def wave_conf(spark):
    conf = cluster_conf(100 * TB)
    saved = {}
    keys = (*_RUNTIME_KEYS, "spark.sql.shuffle.partitions")
    for k in keys:
        try:
            saved[k] = spark.conf.get(k)
        except Exception:  # noqa: BLE001 - unset key
            saved[k] = None
    for k in _RUNTIME_KEYS:
        spark.conf.set(k, conf[k])
    # cluster-shaped over-provision; AQE must coalesce it back down
    spark.conf.set("spark.sql.shuffle.partitions", "2048")
    yield conf
    for k, v in saved.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def _mod_sum(n: int, m: int) -> int:
    """sum(i % m for i in range(n)), closed form."""
    cycles, rem = divmod(n, m)
    return cycles * (m * (m - 1) // 2) + rem * (rem - 1) // 2


def test_wave_aggregation_coalesces_and_is_exact(spark, wave_conf):
    df = spark.range(N).select(
        (F.col("id") % GROUPS).alias("k"), (F.col("id") % MOD).alias("v")
    )
    agg = df.groupBy("k").agg(F.sum("v").alias("s"), F.count("*").alias("c"))
    total = agg.agg(
        F.sum("s").alias("ts"), F.sum("c").alias("tc"),
        F.count("*").alias("groups"),
    )
    row = total.collect()[0]
    assert row["tc"] == N
    assert row["groups"] == GROUPS
    assert row["ts"] == _mod_sum(N, MOD)
    final = P.plan_str(total)
    assert "isFinalPlan=true" in final
    # 2048 static partitions → AQE coalesced shuffle reads in the final
    # plan (the guard: if coalescing breaks, the cluster conf starts
    # scheduling 2048 near-empty reducers per stage at every scale)
    assert "AQEShuffleRead" in final, final[:800]
    assert "coalesced" in final.lower(), final[:800]


def test_wave_hot_key_ewma_bounded_groups(spark, wave_conf):
    """VERDICT r4 #7 at wave scale: ONE key holding 10⁷ ordered events
    folds through the chunked dyadic-EWMA (operators/recurrence.py)
    under the 100 TB conf. The naive applyInPandas would materialize a
    10⁷-row pandas frame in one Python worker; the chunked path's
    biggest group is 4096 event rows (pass 1) / ~2.4k summary rows
    (pass 2). Exactness is checked against a driver-side reference
    fold of the same periodic sequence — any ordering or transfer-
    function error diverges within ~60 trailing elements."""
    from jobx_spark.operators.recurrence import ewma_dyadic_fold

    n = 10_000_000
    df = spark.range(n).select(
        F.lit(0).cast("long").alias("user_id"),
        F.col("id").alias("ord"),
        (F.col("id") % MOD).alias("x"),
    )
    out = ewma_dyadic_fold(df, key="user_id", value="x", order=["ord"])
    row = out.collect()[0]
    assert row["n_events"] == n

    acc = 0
    for i in range(n):
        acc = (acc + i % MOD) // 2
    assert row["ewma_s"] == acc


def test_wave_join_broadcasts_from_conf_threshold(spark, wave_conf):
    fact = spark.range(N).select(
        (F.col("id") % GROUPS).alias("k"), (F.col("id") % MOD).alias("v")
    )
    dim = spark.range(GROUPS).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("w")
    )
    joined = (
        fact.join(dim, "k")  # NO broadcast hint: the threshold decides
        .groupBy("w")
        .agg(F.count("*").alias("c"), F.sum("v").alias("s"))
        .orderBy("w")
    )
    rows = joined.collect()
    assert sum(r["c"] for r in rows) == N
    assert sum(r["s"] for r in rows) == _mod_sum(N, MOD)
    # every k in [0, GROUPS) appears N/GROUPS times; w = k%7 buckets
    per_k = N // GROUPS
    assert all(r["c"] % per_k == 0 for r in rows)
    final = P.plan_str(joined)
    assert "isFinalPlan=true" in final
    assert P.has_node(final, "BroadcastHashJoin"), P.node_names(final)
    assert not P.has_node(final, "SortMergeJoin"), P.node_names(final)
