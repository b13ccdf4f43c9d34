"""DP count release: the truncated-geometric mechanism must be exactly
replayable from hashlib + the module's integer thresholds (independent
of Spark expressions and of the SQL oracle), and the thresholds must
describe a valid, symmetric, zero-mode-heavy distribution."""

import hashlib
import math

import duckdb

from jobx_spark.queries.pipeline import (
    _DP_GRID,
    DP_EPS,
    DP_THRESHOLDS,
    DP_TRUNC,
    pipe_dp_release,
)


def test_thresholds_valid_inverse_cdf():
    assert len(DP_THRESHOLDS) == 2 * DP_TRUNC  # last bucket is implicit
    assert all(
        a < b for a, b in zip(DP_THRESHOLDS, DP_THRESHOLDS[1:])
    ), "cumulative thresholds must be strictly increasing"
    assert 0 < DP_THRESHOLDS[0] and DP_THRESHOLDS[-1] < _DP_GRID
    # bucket widths follow alpha^|k| symmetry: width(k) == width(-k)
    alpha = math.exp(-DP_EPS)
    bounds = [0, *DP_THRESHOLDS, _DP_GRID]
    widths = [bounds[i + 1] - bounds[i] for i in range(len(bounds) - 1)]
    for k in range(1, DP_TRUNC + 1):
        w_neg = widths[DP_TRUNC - k]
        w_pos = widths[DP_TRUNC + k]
        assert abs(w_neg - w_pos) <= DP_TRUNC + 1  # integer rounding only
        # geometric decay: each step out loses a factor ~alpha
        assert abs(w_pos / widths[DP_TRUNC] - alpha**k) < 1e-6


def _noise(nation: int, segment: str) -> int:
    h = int(hashlib.md5(f"dp:{nation}|{segment}".encode()).hexdigest()[:15], 16)
    draw = h % _DP_GRID
    for i, t in enumerate(DP_THRESHOLDS):
        if draw < t:
            return i - DP_TRUNC
    return DP_TRUNC


def test_release_matches_independent_replay(spark, sf_dir):
    got = {
        (r["nation"], r["segment"]): r["released_n"]
        for r in pipe_dp_release(spark, sf_dir).collect()
    }
    true = duckdb.sql(
        f"SELECT c_nationkey, c_mktsegment, count(*) AS n"
        f" FROM '{sf_dir}/customer.parquet' GROUP BY 1, 2"
    ).fetchall()
    assert len(got) == len(true)
    for nation, segment, n in true:
        expect = max(int(n) + _noise(nation, segment), 0)
        assert got[(nation, segment)] == expect
