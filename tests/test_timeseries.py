"""Value gate for the DTW operator (no SQL oracle exists for a DP —
this is the correctness check the driver's rows-only row can't give)."""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F

from real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
    timeseries,
)


def _dtw_reference(a: list[float], b: list[float]) -> float:
    """Textbook O(n·m) DTW with |x-y| local cost."""
    n, m = len(a), len(b)
    d = [[math.inf] * (m + 1) for _ in range(n + 1)]
    d[0][0] = 0.0
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            cost = abs(a[i - 1] - b[j - 1])
            d[i][j] = cost + min(d[i - 1][j], d[i][j - 1], d[i - 1][j - 1])
    return d[n][m]


def test_dtw_pairs_matches_reference_dp(spark):
    rng = random.Random(7)
    series = {
        uid: [round(rng.uniform(-3, 3), 3) for _ in range(12)]
        for uid in range(8)
    }
    vectors = spark.createDataFrame(
        [(uid, vec) for uid, vec in series.items()],
        "user_id long, activity_vec array<double>",
    )
    pair_list = [(a, b) for a in range(8) for b in range(8) if a != b]
    pairs = spark.createDataFrame(
        pair_list, "query_user long, neighbor_user long"
    )
    got = {
        (r["query_user"], r["neighbor_user"]): r["dtw_distance"]
        for r in timeseries.dtw_pairs(vectors, pairs).collect()
    }
    assert len(got) == len(pair_list)
    for (a, b), dist in got.items():
        want = _dtw_reference(series[a], series[b])
        assert abs(dist - want) < 1e-9, (a, b, dist, want)
        # metric sanity: symmetry (|x-y| cost is symmetric)
        assert abs(dist - got[(b, a)]) < 1e-9


def test_dtw_self_distance_is_zero_and_shift_beats_euclid(spark):
    """DTW of a series with itself is 0; DTW of a time-shifted copy is
    far below the aligned pointwise (Euclid-style) mismatch — the
    warping property that makes DTW worth its DP."""
    base = [math.sin(i / 2.0) for i in range(20)]
    shifted = base[3:] + base[:3]
    vectors = spark.createDataFrame(
        [(0, base), (1, shifted)],
        "user_id long, activity_vec array<double>",
    )
    pairs = spark.createDataFrame(
        [(0, 0), (0, 1)], "query_user long, neighbor_user long"
    )
    got = {
        (r["query_user"], r["neighbor_user"]): r["dtw_distance"]
        for r in timeseries.dtw_pairs(vectors, pairs).collect()
    }
    assert got[(0, 0)] == 0.0
    pointwise = sum(abs(x - y) for x, y in zip(base, shifted))
    assert got[(0, 1)] < pointwise / 2


def test_dtw_plan_is_single_arrow_crossing(spark):
    """The only Python in the plan is one Arrow-batched MapInPandas —
    no row-wise BatchEvalPython, joins stay JVM-side."""
    vectors = spark.createDataFrame(
        [(i, [float(i), 0.0, 1.0]) for i in range(4)],
        "user_id long, activity_vec array<double>",
    )
    pairs = spark.createDataFrame(
        [(0, 1), (2, 3)], "query_user long, neighbor_user long"
    )
    plan = (
        timeseries.dtw_pairs(vectors, pairs)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("MapInPandas") == 1, plan
    assert "BatchEvalPython" not in plan, plan
