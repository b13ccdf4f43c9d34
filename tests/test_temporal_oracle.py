"""Temporal/advanced operators (as-of join, band join, window frames,
moment statistics, percentiles, argmax) vs the DuckDB oracle."""

import pytest

from jobx_spark.oracle import compare, duck_connect
from jobx_spark.queries import temporal


@pytest.fixture(scope="module")
def duck(sf_dir):
    return duck_connect(sf_dir)


@pytest.mark.parametrize("name", sorted(temporal.QUERIES))
def test_temporal_query_matches_oracle(name, spark, sf_dir, duck):
    df = temporal.QUERIES[name](spark, sf_dir)
    res = compare(name, df, duck, temporal.ORACLES[name])
    assert res.ok, str(res)
