"""Write-path and skew-handling coverage: CSV/JSON round trips,
hive-partitioned parquet with partition pruning, bucketed co-located
joins (zero exchanges), and salted aggregation/join equivalence."""

import pytest
from pyspark.sql import functions as F

from jobx_spark import plans as P
from jobx_spark.operators.skew import salted_aggregate, salted_join
from jobx_spark.sources import load_table, read_csv, read_json
from jobx_spark.sources.sinks import (
    compact,
    drop_table,
    upsert_parquet,
    write_bucketed,
    write_csv,
    write_json,
    write_parquet,
)


def test_compact_reduces_files_preserves_data(spark, sf_dir, tmp_path):
    li = load_table(spark, sf_dir, "lineitem")
    path = str(tmp_path / "li_shattered")
    li.repartition(64).write.parquet(path)  # 64 tiny files
    import glob

    before = len(glob.glob(f"{path}/*.parquet"))
    assert before >= 32
    expected_rows = li.count()
    expected_sum = li.agg(F.sum("l_orderkey")).collect()[0][0]
    n = compact(spark, path, target_file_bytes=64 * 1024 * 1024)
    after = len(glob.glob(f"{path}/*.parquet"))
    assert after == n and after < before
    back = spark.read.parquet(path)
    assert back.count() == expected_rows
    assert back.agg(F.sum("l_orderkey")).collect()[0][0] == expected_sum


def test_upsert_parquet_merges_by_key(spark, sf_dir, tmp_path):
    cust = load_table(spark, sf_dir, "customer")
    path = str(tmp_path / "cust_upsert")
    cust.write.parquet(path)
    n0 = cust.count()
    # updates: bump two existing customers' balance (higher version) and
    # add one brand-new key
    updates = spark.createDataFrame(
        [
            (0, "updated-0", 0, 99999.0, "BUILDING"),
            (1, "updated-1", 0, 88888.0, "BUILDING"),
            (10_000_000, "brand-new", 0, 1.0, "MACHINERY"),
        ],
        schema=cust.schema,
    ).withColumn("c_acctbal", F.col("c_acctbal").cast("double"))
    upsert_parquet(
        spark, path, updates, key_cols=["c_custkey"], version_col="c_acctbal"
    )
    back = spark.read.parquet(path)
    assert back.count() == n0 + 1
    got = {
        r["c_custkey"]: r["c_name"]
        for r in back.filter(
            F.col("c_custkey").isin([0, 1, 10_000_000])
        ).collect()
    }
    assert got[0] == "updated-0" and got[1] == "updated-1"
    assert got[10_000_000] == "brand-new"


def test_csv_round_trip(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 100)
    path = str(tmp_path / "orders_csv")
    write_csv(orders, path)
    back = read_csv(spark, path, schema=orders.schema)
    assert back.count() == orders.count()
    assert sorted(back.columns) == sorted(orders.columns)
    a = {tuple(r) for r in orders.select("o_orderkey", "o_totalprice").collect()}
    b = {tuple(r) for r in back.select("o_orderkey", "o_totalprice").collect()}
    assert a == b


def test_json_round_trip(spark, sf_dir, tmp_path):
    cust = load_table(spark, sf_dir, "customer").limit(50)
    path = str(tmp_path / "cust_json")
    write_json(cust, path)
    back = read_json(spark, path, schema=cust.schema)
    assert back.count() == cust.count()


def test_orc_round_trip_with_pushdown(spark, sf_dir, tmp_path):
    from jobx_spark.sources import read_orc
    from jobx_spark.sources.sinks import write_orc

    part = load_table(spark, sf_dir, "part")
    path = str(tmp_path / "part_orc")
    write_orc(part, path)
    back = read_orc(spark, path).filter(F.col("p_size") <= 10).select(
        "p_partkey", "p_size"
    )
    plan = P.plan_str(back)
    # ORC scan must receive the pushed predicate and prune columns
    assert "PushedFilters" in plan and "p_size" in plan
    expected = part.filter(F.col("p_size") <= 10).count()
    assert back.count() == expected
    a = {tuple(r) for r in part.filter(F.col("p_size") <= 10)
         .select("p_partkey", "p_size").collect()}
    b = {tuple(r) for r in back.collect()}
    assert a == b


def test_parquet_schema_evolution_merge(spark, sf_dir, tmp_path):
    """Schema evolution across appended batches: a later batch adds a
    column; mergeSchema reads union the schemas, old rows null-fill.
    This is how a long-lived 100 TB dataset takes new columns without
    rewriting history."""
    docs = load_table(spark, sf_dir, "documents")
    path = str(tmp_path / "evolving")
    docs.select("doc_id", "lang").write.parquet(path)
    docs.select(
        "doc_id", "lang", F.length("text").alias("text_len")
    ).write.mode("append").parquet(path)

    merged = spark.read.option("mergeSchema", "true").parquet(path)
    assert set(merged.columns) == {"doc_id", "lang", "text_len"}
    n = docs.count()
    assert merged.count() == 2 * n
    # exactly the first batch's rows have the null-filled new column
    assert merged.filter(F.col("text_len").isNull()).count() == n
    # and the evolved column round-trips its values for the second batch
    expect = docs.agg(F.sum(F.length("text"))).collect()[0][0]
    assert merged.agg(F.sum("text_len")).collect()[0][0] == expect


def test_text_source_reads_lines(spark, tmp_path):
    from jobx_spark.sources import read_text

    p = tmp_path / "corpus"
    p.mkdir()
    (p / "a.txt").write_text("alpha beta\ngamma\n")
    (p / "b.txt").write_text("delta\n")
    df = read_text(spark, str(p))
    assert df.columns == ["value"]
    assert sorted(r.value for r in df.collect()) == [
        "alpha beta", "delta", "gamma",
    ]
    whole = read_text(spark, str(p), wholetext=True)
    assert whole.count() == 2  # one row per file


def test_partitioned_parquet_prunes_partitions(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "events_part")
    write_parquet(ev, path, partition_by=["event_type"])
    back = spark.read.parquet(path).filter(F.col("event_type") == "click")
    plan = P.plan_str(back)
    # the filter must prune directories, not scan-and-filter
    assert "PartitionFilters" in plan and "event_type" in plan.split("PartitionFilters", 1)[1].split("\n", 1)[0]
    expected = ev.filter(F.col("event_type") == "click").count()
    assert back.count() == expected


def test_bucketed_join_is_exchange_free(spark, sf_dir, tmp_path):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    try:
        write_bucketed(li, "t_li_b", "l_orderkey", 8,
                       path=str(tmp_path / "li_b"), sort_by="l_orderkey")
        write_bucketed(orders, "t_ord_b", "o_orderkey", 8,
                       path=str(tmp_path / "ord_b"), sort_by="o_orderkey")
        joined = spark.table("t_li_b").join(
            spark.table("t_ord_b"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = P.plan_str(joined)
        # co-located buckets: the join needs NO shuffle exchange
        assert P.count_shuffles(plan) == 0, P.node_names(plan)
        assert joined.count() == li.join(
            orders, li.l_orderkey == orders.o_orderkey
        ).count()
    finally:
        drop_table(spark, "t_li_b")
        drop_table(spark, "t_ord_b")


def test_salted_aggregate_matches_direct(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    salted = salted_aggregate(
        li,
        ["l_returnflag"],
        {
            "n": F.count("*"),
            "max_qty": F.max("l_quantity"),
            "min_qty": F.min("l_quantity"),
        },
        n_salts=8,
    )
    direct = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.max("l_quantity").alias("max_qty"),
        F.min("l_quantity").alias("min_qty"),
    )
    assert {tuple(r) for r in salted.collect()} == {tuple(r) for r in direct.collect()}


def test_salted_join_matches_plain_join(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    orders = (
        load_table(spark, sf_dir, "orders")
        .select(F.col("o_orderkey").alias("l_orderkey"), "o_totalprice")
    )
    salted = salted_join(li, orders, "l_orderkey", n_salts=4)
    plain = li.join(orders, "l_orderkey")
    assert salted.count() == plain.count()
    a = {tuple(r) for r in salted.select("l_orderkey", "l_quantity", "o_totalprice").collect()}
    b = {tuple(r) for r in plain.select("l_orderkey", "l_quantity", "o_totalprice").collect()}
    assert a == b


def test_write_sorted_enables_row_group_skipping(spark, sf_dir, tmp_path):
    """Sort-on-write must produce parquet whose row-group min/max stats
    actually prune: for a narrow shipdate range, the sorted layout
    leaves most row groups skippable while the natural (orderkey) order
    leaves nearly all of them overlapping the predicate."""
    import glob

    import pyarrow.parquet as pq

    from jobx_spark.sources import load_table
    from jobx_spark.sources.sinks import write_sorted

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate", "l_quantity"
    )
    unsorted_path = str(tmp_path / "unsorted")
    sorted_path = str(tmp_path / "sorted")
    # small row groups so both layouts have enough groups to measure;
    # micros timestamps (the session default) carry footer stats, INT96
    # would not
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    spark.conf.set("spark.hadoop.parquet.block.size", str(64 * 1024))
    li.repartition(4).write.parquet(unsorted_path)
    write_sorted(li, sorted_path, ["l_shipdate"], n_files=4)
    spark.conf.unset("spark.hadoop.parquet.block.size")

    lo = li.selectExpr("min(l_shipdate)").first()[0]
    hi = li.selectExpr(
        "min(l_shipdate) + INTERVAL 30 DAYS"
    ).first()[0]

    def prunable_fraction(path: str) -> tuple[int, float]:
        total = kept = 0
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx["l_shipdate"]).statistics
                total += 1
                # footer stats decode tz-aware; Spark rows are naive UTC
                mn = st.min.replace(tzinfo=None)
                mx = st.max.replace(tzinfo=None)
                if mn <= hi and mx >= lo:  # overlaps -> must read
                    kept += 1
        return total, 1 - kept / total

    n_u, frac_u = prunable_fraction(unsorted_path)
    n_s, frac_s = prunable_fraction(sorted_path)
    assert n_u >= 4 and n_s >= 4, "need several row groups to compare"
    # sorted layout: the 30-day slice lives in few groups
    assert frac_s >= 0.5, f"sorted layout prunes too little: {frac_s:.2f}"
    # natural order: shipdates are scattered, almost nothing prunes
    assert frac_u <= 0.25, f"unsorted unexpectedly prunable: {frac_u:.2f}"
    assert frac_s > frac_u


def test_zorder_layout_prunes_on_both_columns(spark, sf_dir, tmp_path):
    """Z-order clustering must make range predicates on EITHER column
    skip row groups, where a single-column sort only serves its own
    column: partkey predicates prune ~nothing under an orderkey sort
    but substantially under the interleaved layout."""
    import glob

    import pyarrow.parquet as pq

    from jobx_spark.sources import load_table
    from jobx_spark.sources.sinks import write_sorted, write_zordered

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    # tiny test data fits one row group per file, so granularity comes
    # from file count: 16 files ~= 16 row groups
    by_order = str(tmp_path / "by_order")
    zordered = str(tmp_path / "zorder")
    write_sorted(li, by_order, ["l_orderkey"], n_files=16)
    write_zordered(li, zordered, ["l_orderkey", "l_partkey"], n_files=16)

    stats = li.selectExpr(
        "min(l_partkey)", "max(l_partkey)", "min(l_orderkey)", "max(l_orderkey)"
    ).first()
    pk_lo, pk_hi = stats[0], stats[0] + (stats[1] - stats[0]) // 8
    ok_lo, ok_hi = stats[2], stats[2] + (stats[3] - stats[2]) // 8

    def prunable(path: str, col: str, lo, hi) -> float:
        total = kept = 0
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx[col]).statistics
                total += 1
                if st.min <= hi and st.max >= lo:
                    kept += 1
        assert total >= 12, f"need row groups to measure, got {total}"
        return 1 - kept / total

    # single-column sort: own column prunes hard, the other ~not at all
    assert prunable(by_order, "l_orderkey", ok_lo, ok_hi) >= 0.5
    assert prunable(by_order, "l_partkey", pk_lo, pk_hi) <= 0.2
    # z-order: BOTH columns prune meaningfully
    z_ok = prunable(zordered, "l_orderkey", ok_lo, ok_hi)
    z_pk = prunable(zordered, "l_partkey", pk_lo, pk_hi)
    assert z_ok >= 0.3, f"zorder orderkey pruning too weak: {z_ok:.2f}"
    assert z_pk >= 0.3, f"zorder partkey pruning too weak: {z_pk:.2f}"


def test_binary_file_source_feeds_asset_pipeline(spark, tmp_path):
    """binaryFile scan → asset convention → metadata pass: real bytes
    round-trip (content intact, digest over the actual file payload),
    and pathGlobFilter prunes non-asset files at listing time."""
    import hashlib

    from pyspark.sql import functions as F

    from jobx_spark.operators.multimodal import payload_metadata
    from jobx_spark.sources import read_binary_files

    payloads = {f"a{i}.png": bytes([i, 255 - i]) * 40 for i in range(4)}
    for name, data in payloads.items():
        (tmp_path / name).write_bytes(data)
    (tmp_path / "notes.txt").write_bytes(b"not an asset")

    raw = read_binary_files(spark, str(tmp_path), glob="*.png")
    assert raw.count() == 4  # the .txt file never listed

    assets = raw.select(
        F.regexp_extract(F.col("path"), r"a(\d+)\.png$", 1)
        .cast("bigint")
        .alias("asset_id"),
        F.lit("image/png").alias("kind"),
        F.col("content").alias("data"),
        F.col("length").cast("bigint").alias("src_len"),
    )
    meta = {r["asset_id"]: r for r in payload_metadata(assets).collect()}
    for i in range(4):
        expected = payloads[f"a{i}.png"]
        assert meta[i]["src_len"] == len(expected)
        assert meta[i]["digest"] == hashlib.md5(expected).hexdigest()
