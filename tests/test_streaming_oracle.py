"""Structured Streaming operators (tumbling/sliding/session windows,
applyInPandasWithState) run to completion via AvailableNow and compared
against the DuckDB batch oracle."""

import pytest

from jobx_spark.oracle import compare, duck_connect
from jobx_spark.queries import streams


@pytest.fixture(scope="module")
def duck(sf_dir):
    return duck_connect(sf_dir)


@pytest.mark.parametrize("name", sorted(streams.QUERIES))
def test_streaming_query_matches_oracle(name, spark, sf_dir, duck):
    df = streams.QUERIES[name](spark, sf_dir)
    res = compare(name, df, duck, streams.ORACLES[name])
    assert res.ok, str(res)
