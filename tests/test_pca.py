"""Integer power-iteration PCA: the fixed-point arithmetic must agree
with a float eigensolver on the DIRECTION (that is the claim the
oracle can't check — it replays the same integer recurrence, so a
systematically-wrong recurrence would still hash-match)."""

import numpy as np
import pytest

from jobx_spark.operators.similarity import (
    _tdiv,
    gram_matrix,
    power_iteration_top,
)


def test_tdiv_truncates_toward_zero():
    # Spark `div` / DuckDB `//` semantics, NOT Python floor division
    assert _tdiv(7, 2) == 3
    assert _tdiv(-7, 2) == -3  # Python -7 // 2 == -4
    assert _tdiv(0, 5) == 0


def _np_top_eig(x: np.ndarray) -> np.ndarray:
    g = x.T @ x
    vals, vecs = np.linalg.eigh(g)
    return vecs[:, -1]


@pytest.mark.parametrize("seed", [0, 7])
def test_power_iteration_matches_float_eigensolver(spark, seed):
    rng = np.random.default_rng(seed)
    dim, n = 16, 400
    # anisotropic cloud: one dominant direction + noise
    axis = rng.normal(size=dim)
    axis /= np.linalg.norm(axis)
    pts = (
        np.outer(rng.normal(scale=3.0, size=n), axis)
        + rng.normal(scale=0.5, size=(n, dim))
    ).astype(np.float64)
    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(pts)],
        "id long, embedding array<double>",
    )

    rows = gram_matrix(df, dim=dim, scale=1024).collect()
    assert sum(1 for r in rows if r["i"] < 0) == 1
    assert next(r["g"] for r in rows if r["i"] < 0) == n

    v = power_iteration_top(rows, dim=dim)
    vf = np.array(v, dtype=np.float64)
    vf /= np.linalg.norm(vf)
    ref = _np_top_eig(np.floor(pts * 1024))
    cos = abs(float(vf @ ref))
    assert cos > 0.999, cos


def test_gram_matrix_is_exact(spark):
    rng = np.random.default_rng(3)
    pts = rng.uniform(-0.5, 0.5, size=(50, 4))
    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(pts)],
        "id long, embedding array<double>",
    )
    got = {
        (r["i"], r["j"]): r["g"]
        for r in gram_matrix(df, dim=4, scale=1024).collect()
        if r["i"] >= 0
    }
    x = np.floor(pts * 1024).astype(np.int64)
    want = x.T @ x
    assert got == {
        (i, j): int(want[i, j]) for i in range(4) for j in range(4)
    }
