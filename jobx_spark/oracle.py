"""Self-check harness mirroring the driver's DuckDB correctness gate.

The driver runs each ``queries()[name]`` and the matching
``oracle_sql()[name]`` side-by-side and compares row count, schema and
an order-insensitive value hash. This module reproduces that comparison
locally (stricter, even: exact cell equality after sorting) so every
query is validated *before* the driver sees it.
"""

from __future__ import annotations

import datetime
import math
from dataclasses import dataclass, field

import duckdb
from pyspark.sql import DataFrame, SparkSession

from jobx_spark.sources import TABLES


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm_cell(v):
    """Normalize a cell to a canonical comparable value."""
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, int):
        return v
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm_cell(x)) for k, x in v.items()))
    return v


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
    """
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    rel = con.execute(sql)
    d_cols = [c[0] for c in rel.description]
    d_rows = rel.fetchall()

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


def _approx_eq(a, b, rtol: float = 1e-9) -> bool:
    if type(a) is not type(b):
        return False
    if isinstance(a, tuple):
        return len(a) == len(b) and all(_approx_eq(x, y, rtol) for x, y in zip(a, b))
    if isinstance(a, float):
        return math.isclose(a, b, rel_tol=rtol, abs_tol=1e-12)
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
