"""Behavioral contracts of the cardinality/membership sketches:
mergeability and one-sided error — the properties that make them safe
at 100 TB — independent of the oracle equality tests."""

from pyspark.sql import functions as F

from jobx_spark.operators.sketches import (
    HLL_M,
    bloom_positions,
    bloom_probe,
    hll_estimate,
    hll_registers,
)


def _ids(spark, lo, hi, col="k"):
    return spark.range(lo, hi).select(F.col("id").cast("string").alias(col))


def test_bloom_never_false_negative(spark):
    members = _ids(spark, 0, 300)
    filt = bloom_positions(members, "k")
    passed = bloom_probe(_ids(spark, 0, 1000), "k", filt)
    got = {r.key for r in passed.collect()}
    assert {str(i) for i in range(300)} <= got  # every member passes


def test_bloom_filters_most_nonmembers(spark):
    members = _ids(spark, 0, 300)
    filt = bloom_positions(members, "k")
    passed = bloom_probe(_ids(spark, 0, 1000), "k", filt)
    fp = passed.count() - 300
    assert 0 <= fp < 200  # 4096 bits / 300 keys: far from saturated


def test_bloom_positions_union_is_filter_union(spark):
    a, b = _ids(spark, 0, 100), _ids(spark, 100, 200)
    both = bloom_positions(a.union(b), "k")
    merged = bloom_positions(a, "k").union(bloom_positions(b, "k")).distinct()
    assert both.exceptAll(merged).count() == 0
    assert merged.exceptAll(both).count() == 0


def test_hll_registers_merge_by_max(spark):
    a, b = _ids(spark, 0, 500, "v"), _ids(spark, 300, 900, "v")
    whole = hll_registers(a.union(b), "v")
    merged = (
        hll_registers(a, "v").union(hll_registers(b, "v"))
        .groupBy("register").agg(F.max("max_rho").alias("max_rho"))
    )
    diff = whole.join(merged, "register").filter(
        whole.max_rho != merged.max_rho
    )
    assert whole.count() == HLL_M
    assert diff.count() == 0


def test_hll_estimate_in_range(spark):
    regs = hll_registers(_ids(spark, 0, 2000, "v"), "v")
    row = hll_estimate(regs).collect()[0]
    # raw HLL on 64 registers: ~1.04/sqrt(64) = 13% stderr; allow 3σ
    assert 2000 * 0.6 < row.hll_est < 2000 * 1.4
    assert row.zero_registers == 0


def test_sketch_ops_partitioning_invariance(spark, sf_dir):
    """Cluster-shape independence for the session-3 operators: k-core,
    HLL registers, and learned BPE merges must be identical under
    different input partitionings (the reproducibility property across
    cluster sizes / AQE decisions / retries)."""
    from jobx_spark.operators.dedup import kcore, minhash_lsh_pairs
    from jobx_spark.operators.text import tokens
    from jobx_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")

    kc = [
        sorted(map(tuple, kcore(minhash_lsh_pairs(docs.repartition(n))).collect()))
        for n in (3, 17)
    ]
    assert kc[0] == kc[1]

    regs = [
        sorted(map(tuple, hll_registers(
            docs.repartition(n).select(
                F.explode(tokens(F.col("text"))).alias("tok")
            ), "tok",
        ).collect()))
        for n in (3, 17)
    ]
    assert regs[0] == regs[1]


def test_bpe_learn_partitioning_invariance(spark, sf_dir):
    from jobx_spark.queries.pipeline import BPE_MERGES, pipe_bpe_learn

    rows = sorted(map(tuple, pipe_bpe_learn(spark, sf_dir).collect()))
    assert len(rows) == BPE_MERGES
    again = sorted(map(tuple, pipe_bpe_learn(spark, sf_dir).collect()))
    assert rows == again
