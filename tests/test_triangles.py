"""triangle_counts on hand-built graphs: known closed-form triangle
censuses, hub-heavy shapes (the case degree orientation exists for),
and input normalization (duplicate edges, reversed orientation,
self-loops)."""

from pyspark.sql import functions as F

from jobx_spark.operators.dedup import triangle_counts


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "id_a long, id_b long")


def _counts(df):
    return {r["node"]: r["n_triangles"] for r in df.collect()}


def test_k4_every_node_in_three_triangles(spark):
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    assert _counts(triangle_counts(_edges(spark, k4))) == {i: 3 for i in range(4)}


def test_path_and_star_have_no_triangles(spark):
    path = [(0, 1), (1, 2), (2, 3)]
    star = [(0, i) for i in range(1, 8)]
    assert _counts(triangle_counts(_edges(spark, path))) == {}
    assert _counts(triangle_counts(_edges(spark, star))) == {}


def test_hub_with_one_closed_wedge(spark):
    # star hub 0 with leaves 1..6, plus one leaf-leaf edge (1,2):
    # exactly one triangle {0,1,2} despite the hub's degree dominance.
    edges = [(0, i) for i in range(1, 7)] + [(1, 2)]
    assert _counts(triangle_counts(_edges(spark, edges))) == {0: 1, 1: 1, 2: 1}


def test_duplicate_reversed_and_self_loop_edges_normalize(spark):
    tri = [(0, 1), (1, 2), (2, 0)]
    messy = tri + [(1, 0), (2, 1), (0, 2), (0, 1), (1, 1)]
    assert _counts(triangle_counts(_edges(spark, messy))) == {0: 1, 1: 1, 2: 1}


def test_two_disjoint_triangles_sharing_no_nodes(spark):
    edges = [(0, 1), (1, 2), (2, 0), (10, 11), (11, 12), (12, 10)]
    assert _counts(triangle_counts(_edges(spark, edges))) == {
        0: 1, 1: 1, 2: 1, 10: 1, 11: 1, 12: 1,
    }
