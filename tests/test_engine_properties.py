"""Property-based engine semantics (hypothesis): the MapReduce loop must
agree with a plain Python fold for ARBITRARY inputs, not just the dev
fixtures — the reference's invariants (FIXTURES.md §A.4) generalized.

Example counts are small (each engine run is a real Spark job ~seconds);
the value is the generator's adversarial shapes (negative ints, dup
keys, unicode keys, empty-ish), not volume.
"""

import json

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from jobx_spark.engine import Engine
from jobx_spark.handlers import MrConfigureToReturn


def _mapper_passthrough(scope, arguments):
    yield MrConfigureToReturn()
    for k, v in arguments:
        yield (k, v)


def _reducer_sum(scope, results):
    totals = {}
    for k, vl in results:
        totals[k] = totals.get(k, 0) + _deep_sum(vl)
    for k in sorted(totals, key=str):
        yield (k, totals[k])


def _deep_sum(x):
    if isinstance(x, list):
        return sum(_deep_sum(i) for i in x)
    return x


@pytest.fixture(scope="module")
def engine(spark):
    e = Engine(spark)
    e.create_workflow("wfp")
    e.register_handler("wfp", "pass", fn=_mapper_passthrough, handler_type="mapper")
    e.register_handler("wfp", "sum", fn=_reducer_sum, handler_type="reducer")
    e.create_step("wfp", "sp", "pass", "sum")
    e.create_job("wfp", "jp", "sp")
    return e


# keys include unicode + quote-ish characters (JSON-encoding hazards);
# values span negative/large ints
_KEYS = st.sampled_from(["a", "b", "β", 'q"uote', "nul ish", "7", ""])
_PAIRS = st.lists(
    st.tuples(_KEYS, st.integers(min_value=-(2**40), max_value=2**40)),
    min_size=1,
    max_size=40,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pairs=_PAIRS)
def test_dataset_sum_matches_python_fold(engine, spark, pairs):
    """engine.submit_dataset(map→bucket-combine→reduce→fold) over an
    arbitrary keyed-int dataset == a plain Python groupby-sum."""
    pairs_df = spark.createDataFrame(
        [(json.dumps(k), json.dumps(v)) for k, v in pairs], "k string, v string"
    )
    req = engine.submit_dataset("wfp", "jp", pairs_df, n_buckets=8)
    got = {k: v for k, v in req.result["pairs"]}
    want: dict = {}
    for k, v in pairs:
        want[k] = want.get(k, 0) + v
    assert got == want


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    args=st.dictionaries(
        st.sampled_from(["x", "y", "z"]),
        st.integers(min_value=-(10**6), max_value=10**6),
        min_size=1,
        max_size=3,
    )
)
def test_submit_arguments_sum_conservation(engine, args):
    """Blocking submit over the arguments dict: per-key totals equal the
    inputs exactly (passthrough mapper + sum reducer), and replaying the
    identical submission yields the identical envelope (content-derived
    invocation ids → deterministic replay)."""
    spec = [(k, "int") for k in args]
    engine.register_handler(
        "wfp", "pass", fn=_mapper_passthrough, handler_type="mapper",
        argument_spec=spec,
    )
    r1 = engine.submit("wfp", "jp", dict(args))
    r2 = engine.submit("wfp", "jp", dict(args))
    assert r1.result == r2.result
    assert {k: v for k, v in r1.result["pairs"]} == args
