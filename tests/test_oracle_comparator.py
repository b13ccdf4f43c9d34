"""The driver-faithful comparator is load-bearing: round 3 shipped a
red gate row because the local comparator was numeric-tolerant where
the driver is string-canonical. These tests pin the r4 semantics —
pandas fetch on both sides, type-strict tagged cells — against the
exact divergence classes that caused (or nearly caused) red rows.

No SparkSession: the duck side runs through the real `.df()` fetch
path; the "spark side" is simulated with a pandas frame shaped like
``toPandas()`` output, normalized by the same `_pandas_rows`.
"""

import duckdb
import pandas as pd

from jobx_spark.oracle import _norm_cell, _pandas_rows


def _norm_frame(df: pd.DataFrame) -> list[tuple]:
    return [tuple(_norm_cell(v) for v in row) for row in _pandas_rows(df)]


def test_hugeint_float64_mismatches_int64():
    """The pipe_pack_offsets class: DuckDB windowed SUM(BIGINT) →
    HUGEINT → float64 via pandas, which must NOT equal int64 0."""
    duck = duckdb.connect().execute(
        "SELECT SUM(x) OVER () - 3 AS v FROM (VALUES (1::BIGINT),(2::BIGINT)) t(x) LIMIT 1"
    ).df()
    assert duck["v"].dtype == "float64"  # the driver's fetch behavior
    spark_like = pd.DataFrame({"v": pd.Series([0], dtype="int64")})
    assert _norm_frame(duck) != _norm_frame(spark_like)
    # and the CAST fix makes them equal
    fixed = duckdb.connect().execute(
        "SELECT CAST(SUM(x) OVER () - 3 AS BIGINT) AS v"
        " FROM (VALUES (1::BIGINT),(2::BIGINT)) t(x) LIMIT 1"
    ).df()
    assert _norm_frame(fixed) == _norm_frame(spark_like)


def test_date_column_matches_duck_midnight_datetime64():
    """The q47 class: duck DATE arrives as datetime64; an all-midnight
    column renders date-form and must equal Spark's datetime.date."""
    import datetime

    duck = duckdb.connect().execute("SELECT DATE '2024-01-01' AS d").df()
    assert str(duck["d"].dtype).startswith("datetime64")
    spark_like = pd.DataFrame({"d": [datetime.date(2024, 1, 1)]})  # object
    assert _norm_frame(duck) == _norm_frame(spark_like)


def test_timestamp_with_time_component_stays_full_form():
    duck = duckdb.connect().execute(
        "SELECT TIMESTAMP '2024-01-01 05:30:00' AS t"
    ).df()
    (row,) = _norm_frame(duck)
    assert row == ("2024-01-01 05:30:00",)


def test_nan_equals_nan_and_null_int_promotes_like_both_sides():
    duck = duckdb.connect().execute(
        "SELECT * FROM (VALUES (1::BIGINT),(NULL)) t(x) ORDER BY x NULLS LAST"
    ).df()
    assert duck["x"].dtype == "float64"  # NULL promotes the whole column
    spark_like = pd.DataFrame({"x": [1.0, float("nan")]})  # toPandas does the same
    assert _norm_frame(duck) == _norm_frame(spark_like)


def test_int_float_never_cross_compare():
    a = pd.DataFrame({"v": pd.Series([7], dtype="int64")})
    b = pd.DataFrame({"v": pd.Series([7.0], dtype="float64")})
    assert _norm_frame(a) != _norm_frame(b)


def test_string_array_never_aliases_a_tagged_scalar():
    """ADVICE r4: a genuine 2-element string array whose first element
    happens to spell a tag name ("f", "1.5") must not normalize equal
    to a tagged float 1.5 — the sentinel makes tags unforgeable."""
    arr = _norm_cell(["f", "1.5"])
    flt = _norm_cell(1.5)
    assert arr != flt
    assert arr == ("f", "1.5")  # data arrays keep their plain form

    from jobx_spark.oracle import _approx_eq

    # and the approx path must not treat the array as a float tag
    assert not _approx_eq(arr, flt)
    assert _approx_eq(_norm_cell(1.5), _norm_cell(1.5 + 1e-13))


def test_bool_is_not_int():
    a = pd.DataFrame({"v": pd.Series([True])})
    b = pd.DataFrame({"v": pd.Series([1], dtype="int64")})
    assert _norm_frame(a) != _norm_frame(b)
