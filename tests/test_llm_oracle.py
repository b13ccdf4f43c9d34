"""LLM-pipeline operator queries (dedup / similarity / text) must match
their DuckDB oracles exactly at sf0.001."""

import pytest

from jobx_spark.oracle import compare, duck_connect
from jobx_spark.queries import dedup, mapreduce, multimodal, similarity, text

MODS = {
    "mapreduce": mapreduce,
    "dedup": dedup,
    "similarity": similarity,
    "text": text,
    "multimodal": multimodal,
}
ALL = [(mod, name) for mod in sorted(MODS) for name in sorted(MODS[mod].QUERIES)]


@pytest.fixture(scope="module")
def duck(sf_dir):
    return duck_connect(sf_dir)


@pytest.mark.parametrize("mod,name", ALL)
def test_llm_query_matches_oracle(mod, name, spark, sf_dir, duck):
    m = MODS[mod]
    df = m.QUERIES[name](spark, sf_dir)
    res = compare(name, df, duck, m.ORACLES[name])
    assert res.ok, str(res)
    assert res.spark_rows > 0, f"{name} produced no rows — degenerate"
