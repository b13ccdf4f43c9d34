"""Every relational query must exactly match its DuckDB oracle at
sf0.001 (the driver repeats this at sf0.01 — same code path)."""

import pytest

from jobx_spark.oracle import compare, duck_connect
from jobx_spark.queries import relational


@pytest.fixture(scope="module")
def duck(sf_dir):
    return duck_connect(sf_dir)


@pytest.mark.parametrize("name", sorted(relational.QUERIES))
def test_relational_query_matches_oracle(name, spark, sf_dir, duck):
    df = relational.QUERIES[name](spark, sf_dir)
    res = compare(name, df, duck, relational.ORACLES[name])
    assert res.ok, str(res)
