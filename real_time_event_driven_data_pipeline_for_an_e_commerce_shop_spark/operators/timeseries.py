"""Dynamic time warping over candidate pairs — the one operator family
in the engine whose core recurrence genuinely cannot be expressed as
Spark SQL expressions (or ANSI SQL): the DTW cell ``d[i][j]`` depends
on three previously *computed* cells, a data-dependent DP, not a fold.

It therefore uses the documented Arrow escape hatch (SURVEY.md §2.8
discipline): ONE ``mapInPandas`` crossing, batch-vectorized so the
Python work is ``len_a × len_b`` numpy steps per batch regardless of
how many pairs the batch holds. Everything around it — candidate
generation (correlation top-k), vector attach joins, ranking — stays
JVM-side.

Correctness gate: no DuckDB oracle exists for a DP (the driver records
a rows-only check for the query that uses this), so the VALUE gate
lives in tests/test_timeseries.py — batch output equals a pure-Python
reference DP cell-for-cell, plus the metric's symmetry/identity
properties.

Scale shape: pairs arrive pre-blocked (top-k candidates, never all
pairs); the DP cost is ``|pairs| × n²`` with n = series length (30),
embarrassingly parallel across partitions; vectors ride the pair rows
so no per-batch broadcast state is needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dtw_batch(A, B):
    """Vectorized DTW across a batch: A, B are (batch, n) / (batch, m)
    float arrays; returns (batch,) distances. The i/j loops are over
    the 30×30 grid — numpy vectorizes across the batch dimension."""
    import numpy as np

    n, m = A.shape[1], B.shape[1]
    inf = np.inf
    prev = np.full((A.shape[0], m + 1), inf)
    prev[:, 0] = 0.0
    for i in range(1, n + 1):
        cur = np.full((A.shape[0], m + 1), inf)
        ai = A[:, i - 1]
        for j in range(1, m + 1):
            cost = np.abs(ai - B[:, j - 1])
            cur[:, j] = cost + np.minimum(
                np.minimum(prev[:, j], cur[:, j - 1]), prev[:, j - 1]
            )
        prev = cur
    return prev[:, m]


def dtw_pairs(
    vectors: DataFrame,
    pairs: DataFrame,
    id_col: str = "user_id",
    vec_col: str = "activity_vec",
    left_col: str = "query_user",
    right_col: str = "neighbor_user",
) -> DataFrame:
    """DTW distance for each candidate pair: attach both series
    (two JVM equi-joins), cross to Python once via ``mapInPandas``."""
    va = vectors.select(
        F.col(id_col).alias(left_col), F.col(vec_col).alias("_va")
    )
    vb = vectors.select(
        F.col(id_col).alias(right_col), F.col(vec_col).alias("_vb")
    )
    attached = pairs.select(left_col, right_col).join(va, left_col).join(
        vb, right_col
    )

    schema = f"{left_col} long, {right_col} long, dtw_distance double"

    def compute(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if pdf.empty:
                continue
            A = np.stack(pdf["_va"].to_numpy())
            B = np.stack(pdf["_vb"].to_numpy())
            yield pd.DataFrame(
                {
                    left_col: pdf[left_col].to_numpy(),
                    right_col: pdf[right_col].to_numpy(),
                    "dtw_distance": _dtw_batch(A, B),
                }
            )

    return attached.mapInPandas(compute, schema)
