"""Blanket plan audit over the whole batch query surface.

Two properties every query must satisfy, asserted from the physical
plan without executing anything:

  * no CartesianProduct — an unconditioned join must have become a
    broadcast variant, never an all-pairs shuffle product;
  * no BatchEvalPython — row-at-a-time Python UDFs are banned from the
    engine; Python is allowed only through Arrow (ArrowEvalPython /
    mapInPandas / FlatMapGroupsInPandas), which batch-vectorizes.

Streaming queries are excluded: building them executes the stream (the
returned DataFrame is the materialized sink table, whose plan is a
memory scan — nothing to audit).
"""

import pytest

from jobx_spark import plans as P
from jobx_spark.queries import all_queries

BATCH_QUERIES = sorted(
    name for name in all_queries() if not name.startswith("stream_")
)


@pytest.mark.parametrize("name", BATCH_QUERIES)
def test_no_cartesian_no_rowwise_python(name, spark, sf_dir):
    df = all_queries()[name](spark, sf_dir)
    plan = P.plan_str(df)
    assert not P.has_node(plan, "CartesianProduct"), (
        f"{name}: cartesian product in plan\n{P.node_names(plan)}"
    )
    assert "BatchEvalPython" not in plan, (
        f"{name}: row-at-a-time Python UDF in plan"
    )
