"""Training-data pipeline operators (hash sampling, weighted mixing,
chunking, composed clean-corpus) vs the DuckDB oracle."""

import pytest

from jobx_spark.oracle import compare, duck_connect
from jobx_spark.queries import pipeline


@pytest.fixture(scope="module")
def duck(sf_dir):
    return duck_connect(sf_dir)


@pytest.mark.parametrize("name", sorted(pipeline.QUERIES))
def test_pipeline_query_matches_oracle(name, spark, sf_dir, duck):
    df = pipeline.QUERIES[name](spark, sf_dir)
    res = compare(name, df, duck, pipeline.ORACLES[name])
    assert res.ok, str(res)
