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


def test_dtw_rerank_is_closed_over_candidates(spark):
    """VERDICT r5 #7: the DTW re-rank is a RE-RANK — it must emit
    exactly the candidate pair set, never a pair the Pearson top-k
    did not propose (and never silently drop one whose vectors
    exist). Random candidate subsets of varying shape, including
    users that appear only on one side."""
    rng = random.Random(23)
    for trial in range(4):
        n_users = rng.randint(4, 10)
        series = {
            uid: [rng.uniform(-2, 2) for _ in range(10)]
            for uid in range(n_users)
        }
        vectors = spark.createDataFrame(
            [(uid, vec) for uid, vec in series.items()],
            "user_id long, activity_vec array<double>",
        )
        all_pairs = [
            (a, b) for a in range(n_users) for b in range(n_users) if a != b
        ]
        cand = rng.sample(all_pairs, rng.randint(1, len(all_pairs)))
        pairs = spark.createDataFrame(
            cand, "query_user long, neighbor_user long"
        )
        got = {
            (r["query_user"], r["neighbor_user"])
            for r in timeseries.dtw_pairs(vectors, pairs).collect()
        }
        assert got == set(cand), (trial, got ^ set(cand))


def test_dtw_znorm_constant_series_filtered_end_to_end(spark):
    """z-norm edge cases through the REAL feature build
    (daily_activity_vectors): a user whose daily totals are constant
    has zero variance — correlation (and a z-normed DTW) is undefined
    — and MUST be filtered before candidate generation, so the DTW
    stage never sees a NaN vector; every surviving self-pair scores
    exactly 0.0."""
    import datetime as dt

    from real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        events as ev,
    )

    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # user 1: varying activity; user 2: SAME value every day (constant
    # series -> zero variance); user 3: active a single day (nonzero
    # variance: the other 29 days are zero-filled)
    for d in range(10):
        rows.append((eid, 1, "view", base + dt.timedelta(days=d), float(d + 1)))
        eid += 1
        rows.append((eid, 2, "view", base + dt.timedelta(days=d % 30), 5.0))
        eid += 1
    # user 2 must be constant across ALL 30 zero-filled days too:
    # give them 5.0 on every day of the window
    for d in range(10, 30):
        rows.append((eid, 2, "view", base + dt.timedelta(days=d), 5.0))
        eid += 1
    rows.append((eid, 3, "view", base + dt.timedelta(days=4), 7.0))
    df = spark.createDataFrame(
        rows,
        "event_id long, user_id long, event_type string, ts timestamp, value double",
    )
    vecs = ev.daily_activity_vectors(df, start_date="2024-01-01", n_days=30)
    have = {r["user_id"] for r in vecs.select("user_id").collect()}
    assert 2 not in have, "constant series must be filtered (std == 0)"
    assert {1, 3} <= have
    collected = {r["user_id"]: r["activity_vec"] for r in vecs.collect()}
    for uid, v in collected.items():
        assert all(x == x and abs(x) != math.inf for x in v), (uid, v)
        assert abs(sum(v)) < 1e-9, (uid, "z-norm mean must be 0")
    self_pairs = spark.createDataFrame(
        [(u, u) for u in sorted(have)], "query_user long, neighbor_user long"
    )
    got = {
        r["query_user"]: r["dtw_distance"]
        for r in timeseries.dtw_pairs(vecs, self_pairs).collect()
    }
    assert got == {u: 0.0 for u in have}, got


def test_dtw_topk_query_closed_over_candidates_sf001(spark):
    """End-to-end at sf0.01 (VERDICT r5 #7): the registered
    activity_dtw_topk query's output pairs are exactly its own
    correlation-candidate pairs — re-ranked, not regenerated — and
    every emitted distance is finite and >= 0 with a contiguous
    per-query rank."""
    from real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark import (
        queries as q,
    )
    from real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        events as ev,
        similarity,
    )

    sf = "/root/testdata/sf0.01"
    out = q.QUERIES["activity_dtw_topk"](spark, sf).collect()
    evs = spark.read.parquet(f"{sf}/events.parquet")
    vecs = ev.daily_activity_vectors(evs)
    cand = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.brute_force_topk(
            vecs,
            vecs.filter(F.col("user_id") % 13 == 0),
            k=5,
            id_col="user_id",
            vec_col="activity_vec",
        ).collect()
    }
    got_pairs = {(r["query_user"], r["neighbor_user"]) for r in out}
    assert got_pairs == cand, got_pairs ^ cand
    by_q = {}
    for r in out:
        assert r["dtw_distance"] >= 0.0
        assert r["dtw_distance"] == r["dtw_distance"]  # not NaN
        by_q.setdefault(r["query_user"], []).append(r["dtw_rank"])
    for qu, ranks in by_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), (qu, ranks)
