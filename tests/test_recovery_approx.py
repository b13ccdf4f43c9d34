"""Checkpoint recovery, approximate aggregates, and property-based
engine invariants."""

import pytest
from pyspark.sql import functions as F

from jobx_spark import streaming as S
from jobx_spark.sources import load_table


def test_streaming_checkpoint_prevents_reprocessing(spark, sf_dir, tmp_path):
    """A second AvailableNow run over the same checkpoint must process
    nothing: the file-source offsets are committed in the checkpoint, so
    restarts are exactly-once (no double-counted events)."""
    ckpt = str(tmp_path / "ckpt")
    ev = S.stream_events(spark, sf_dir)
    agg = ev.groupBy("event_type").count()

    def run_once(name):
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return q.lastProgress

    first = run_once("ckpt_a")
    second = run_once("ckpt_b")
    assert first["numInputRows"] > 0
    assert second["numInputRows"] == 0  # offsets committed; nothing replayed
    # and the complete-mode state carried over: counts are still correct
    total = spark.table("ckpt_a").agg(F.sum("count")).first()[0]
    expected = load_table(spark, sf_dir, "events").count()
    assert total == expected


def test_approx_count_distinct_error_bound(spark, sf_dir):
    """approx_count_distinct (HLL++) is the 100 TB path for distincts;
    it has no cross-engine oracle (sketches differ), so it is pinned
    here against the exact count with the documented rsd bound."""
    orders = load_table(spark, sf_dir, "orders")
    row = orders.agg(
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("approx"),
        F.countDistinct("o_custkey").alias("exact"),
    ).first()
    assert abs(row["approx"] - row["exact"]) <= max(3, 0.06 * row["exact"])


def test_approx_percentile_brackets_exact(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    row = ev.agg(
        F.percentile_approx("value", 0.5, 10000).alias("p50_approx"),
        F.expr("percentile(value, 0.5)").alias("p50_exact"),
    ).first()
    assert abs(row["p50_approx"] - row["p50_exact"]) <= 0.05 * max(1.0, abs(row["p50_exact"]))


# ---------------------------------------------------------------- properties

try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    HAVE_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    HAVE_HYPOTHESIS = False


if HAVE_HYPOTHESIS:

    @given(
        edges=st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=30),
                st.integers(min_value=0, max_value=30),
            ),
            min_size=1,
            max_size=40,
        )
    )
    @settings(max_examples=10, deadline=None,
              suppress_health_check=list(HealthCheck))
    def test_connected_components_matches_union_find(spark, edges):
        """Pregel-style min-label propagation == textbook union-find,
        for ANY random edge list (self-loops and duplicates included)."""
        from jobx_spark.operators.dedup import connected_components

        parent: dict[int, int] = {}

        def find(x: int) -> int:
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for u, v in edges:
            parent.setdefault(u, u), parent.setdefault(v, v)
            parent[find(u)] = find(v)
        expected = {
            node: min(m for m in parent if find(m) == find(node))
            for node in parent
        }

        df = spark.createDataFrame(edges, "id_a long, id_b long")
        got = {
            r["node"]: r["comp"]
            for r in connected_components(df).collect()
        }
        assert got == expected

    @given(arg=st.integers(min_value=2, max_value=10_000))
    @settings(max_examples=5, deadline=None,
              suppress_health_check=list(HealthCheck))
    def test_chunk_sum_conservation_property(spark, arg):
        """The reference's de-facto correctness invariant (SURVEY §5):
        chunking mappers emit pieces whose reduced total reconstructs a
        function of the input, for ANY argument value."""
        from jobx_spark.engine import Engine
        from jobx_spark.handlers import MrConfigureToReturn

        def mapper(scope, arguments):
            yield MrConfigureToReturn()
            for _k, v in arguments:
                left = v
                piece = 1
                while left > 0:
                    take = min(piece, left)
                    yield ("chunk", take)
                    left -= take
                    piece *= 2

        def reducer(scope, results):
            for k, vl in results:
                yield (k, sum(vl))

        eng = Engine(spark)
        eng.create_workflow("wf_prop")
        eng.register_handler("wf_prop", "m", fn=mapper, handler_type="mapper",
                             argument_spec=[("arg1", "int")])
        eng.register_handler("wf_prop", "r", fn=reducer, handler_type="reducer")
        eng.create_step("wf_prop", "s", "m", "r")
        eng.create_job("wf_prop", "j", "s")
        req = eng.submit("wf_prop", "j", {"arg1": arg})
        [(k, total)] = req.result["pairs"]
        assert k == "chunk" and total == arg
