"""Self-check harness mirroring the driver's DuckDB correctness gate.

The driver runs each ``queries()[name]`` and the matching
``oracle_sql()[name]`` side-by-side and compares row count, schema and
an order-insensitive value hash. This module reproduces that comparison
locally (stricter, even: exact cell equality after sorting) so every
query is validated *before* the driver sees it.
"""

from __future__ import annotations

import datetime
import decimal
import math
from dataclasses import dataclass, field

import duckdb
import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from jobx_spark.sources import TABLES


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


class _TagType:
    """Private sentinel heading every tagged scalar tuple so normalized
    DATA can never alias a tag: a genuine string array ["f", "1.5"]
    normalizes to ("f", "1.5") while a tagged float is
    (_TAG, "f", "1.5") — the sentinel instance is unforgeable from cell
    values (ADVICE r4)."""

    __slots__ = ()

    def __repr__(self) -> str:  # stable sort key via _sort_key's str()
        return "<oracle-tag>"


_TAG = _TagType()


def _norm_cell(v):
    """Normalize a cell to the driver's *string-canonical*, type-strict
    form.

    The driver hashes stringified values after a pandas fetch on both
    sides, so ``0`` (int64) and ``0.0`` (float64) are DIFFERENT — a
    DuckDB HUGEINT (windowed SUM of BIGINT) surfacing as float64 must
    fail here exactly as it fails the gate (the round-3
    ``pipe_pack_offsets`` lesson: a numeric-tolerant local comparator
    predicted green on a red driver row). Each scalar is tagged with a
    type class so int/float/decimal/bool never compare equal across
    classes.
    """
    if v is None:
        return None
    # pandas fetch surfaces missing values as NaN/NaT; fold to None the
    # way a string-canonical "null" does on both sides.
    if v is pd.NaT:
        return None
    if isinstance(v, (bool, np.bool_)):
        return (_TAG, "b", bool(v))
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if math.isnan(f):
            return (_TAG, "f", "NaN")
        return (_TAG, "f", repr(f))
    if isinstance(v, (int, np.integer)):
        return (_TAG, "i", str(int(v)))
    if isinstance(v, decimal.Decimal):
        return (_TAG, "dec", str(v))
    if isinstance(v, pd.Timestamp):
        return str(v.tz_localize(None) if v.tzinfo else v)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ")
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return (_TAG, "bytes", bytes(v).hex())
    if isinstance(v, np.ndarray):
        return tuple(_norm_cell(x) for x in v.tolist())
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm_cell(x)) for k, x in v.items()))
    return v


def _pandas_rows(df: pd.DataFrame) -> list[tuple]:
    """Rows from a pandas frame with pandas' NA sentinels folded the
    same way on both sides: NaT/pd.NA → None, float NaN kept as NaN
    (nullable-int promotion to float64 happens identically on the
    Spark-toPandas and DuckDB-df fetch paths, so NaN==NaN compares
    clean via the "NaN" canonical).

    datetime64 columns are stringified COLUMN-WISE with pandas'
    ``astype(str)`` because that is the driver's rendering: a column
    whose values are all midnight prints date-form ("2024-01-01"),
    matching a Spark DATE column's ``str(date)``, while any non-
    midnight value switches the whole column to full timestamps —
    the behavior that lets duck's DATE→datetime64 conversion still
    hash-match Spark dates (r1-attested q47)."""
    if any(pd.api.types.is_datetime64_any_dtype(df[c]) for c in df.columns):
        df = df.copy()
        for c in df.columns:
            if pd.api.types.is_datetime64_any_dtype(df[c]):
                na = df[c].isna()
                df[c] = df[c].astype(str).astype(object)
                if na.any():
                    df.loc[na, c] = None
    out = []
    for rec in df.itertuples(index=False, name=None):
        row = []
        for v in rec:
            if v is None or v is pd.NaT or v is pd.NA:
                row.append(None)
            else:
                row.append(v)
        out.append(tuple(row))
    return out


def _sort_key(row):
    return tuple((x is None, str(type(x)), str(x)) for x in row)


@dataclass
class CompareResult:
    name: str
    ok: bool
    spark_rows: int
    duck_rows: int
    mismatches: list[str] = field(default_factory=list)

    def __str__(self) -> str:
        status = "OK " if self.ok else "FAIL"
        msg = f"[{status}] {self.name}: spark={self.spark_rows} duck={self.duck_rows}"
        for m in self.mismatches[:5]:
            msg += f"\n    {m}"
        return msg


def compare(
    name: str,
    spark_df: DataFrame,
    con: duckdb.DuckDBPyConnection,
    sql: str,
    float_exact: bool = True,
) -> CompareResult:
    """Compare a Spark result with a DuckDB oracle result.

    Columns are matched by (sorted) name, rows order-insensitively —
    same as the driver. ``float_exact=True`` demands bit equality for
    doubles (our queries are written to achieve it).

    Both sides go through pandas — ``spark_df.toPandas()`` and
    DuckDB's ``.df()`` — because that is the driver's fetch path: it
    is what turns a DuckDB HUGEINT into float64 and a nullable BIGINT
    into float64+NaN, and the canonical comparison is type-strict, so
    this harness reproduces the gate's hash verdict instead of
    predicting green on numerically-equal-but-differently-typed rows.
    """
    s_pdf = spark_df.toPandas()
    s_cols = list(s_pdf.columns)
    s_rows = _pandas_rows(s_pdf)
    d_pdf = con.execute(sql).df()
    d_cols = list(d_pdf.columns)
    d_rows = _pandas_rows(d_pdf)

    mismatches: list[str] = []
    if sorted(s_cols) != sorted(d_cols):
        mismatches.append(f"columns differ: spark={sorted(s_cols)} duck={sorted(d_cols)}")
        return CompareResult(name, False, len(s_rows), len(d_rows), mismatches)
    if len(s_rows) != len(d_rows):
        mismatches.append("row counts differ")

    s_order = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
    d_order = sorted(range(len(d_cols)), key=lambda i: d_cols[i])
    s_norm = sorted(
        (tuple(_norm_cell(r[i]) for i in s_order) for r in s_rows), key=_sort_key
    )
    d_norm = sorted(
        (tuple(_norm_cell(r[i]) for i in d_order) for r in d_rows), key=_sort_key
    )
    n_bad = 0
    for i, (a, b) in enumerate(zip(s_norm, d_norm)):
        if a == b:
            continue
        if not float_exact and _approx_eq(a, b):
            continue
        n_bad += 1
        if n_bad <= 3:
            mismatches.append(f"row {i}: spark={a!r} duck={b!r}")
    if n_bad > 3:
        mismatches.append(f"... {n_bad} mismatched rows total")
    ok = not mismatches
    return CompareResult(name, ok, len(s_rows), len(d_rows), mismatches)


def result_hash(spark_df: DataFrame) -> str:
    """Canonical content hash of a Spark result: the same pandas-fetch
    canonicalization ``compare`` applies (column-name-sorted, row-order-
    insensitive, NA sentinels folded), collapsed to one sha256. Used by
    the cross-run determinism attestation (VERDICT r9 #6): running the
    same query twice in one session must produce the same hash, which
    pins nondeterministic-plan regressions — shuffle-order-sensitive
    UDFs, uncontrolled float reductions — that a single-run oracle gate
    cannot see."""
    import hashlib

    pdf = spark_df.toPandas()
    cols = list(pdf.columns)
    rows = _pandas_rows(pdf)
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    norm = sorted(
        (tuple(_norm_cell(r[i]) for i in order) for r in rows),
        key=_sort_key,
    )
    h = hashlib.sha256()
    h.update(repr(sorted(cols)).encode())
    for row in norm:
        h.update(repr(row).encode())
    return h.hexdigest()


def _approx_eq(a, b, rtol: float = 1e-9) -> bool:
    if type(a) is not type(b):
        return False
    if isinstance(a, tuple):
        if (
            len(a) == 3 and a[0] is _TAG and a[1] == "f"
            and len(b) == 3 and b[0] is _TAG and b[1] == "f"
        ):  # tagged float
            if a[2] == "NaN" or b[2] == "NaN":
                return a[2] == b[2]
            return math.isclose(float(a[2]), float(b[2]), rel_tol=rtol, abs_tol=1e-12)
        return len(a) == len(b) and all(_approx_eq(x, y, rtol) for x, y in zip(a, b))
    return a == b


def run_all(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> list[CompareResult]:
    from jobx_spark.queries import all_oracles, all_queries

    queries, oracles = all_queries(), all_oracles()
    con = duck_connect(sf_dir)
    results = []
    for name, fn in queries.items():
        if names and name not in names:
            continue
        if name not in oracles:
            continue  # rows-only queries have no oracle to self-check
        df = fn(spark, sf_dir)
        results.append(compare(name, df, con, oracles[name]))
    return results
