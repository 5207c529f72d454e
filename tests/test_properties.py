"""Property-based tests (hypothesis): the engine's determinism and
operator semantics hold over generated inputs, not just fixtures."""

from __future__ import annotations

import pytest

import math

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
    asof,
    events,
)

FAST = settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

money = st.floats(
    min_value=0.0, max_value=1e6, allow_nan=False, allow_infinity=False
)


@given(st.lists(money, min_size=1, max_size=40))
@FAST
def test_det_round_matches_python_half_up(spark, xs):
    """floor(x*100+0.5)/100 in Spark == the same IEEE ops in Python."""
    from real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.functions.core import (
        det_round,
    )

    df = spark.createDataFrame([(float(x),) for x in xs], "v double")
    got = [r["r"] for r in df.select(det_round(F.col("v"), 2).alias("r")).collect()]
    want = [math.floor(x * 100.0 + 0.5) / 100.0 for x in xs]
    assert got == want


@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 10_000), money),
        min_size=1,
        max_size=60,
    ),
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 10_000), st.integers(0, 100)),
        min_size=1,
        max_size=60,
    ),
)
@FAST
@pytest.mark.slow
def test_asof_join_matches_pandas_merge_asof(spark, left_rows, right_rows):
    """The union-sort as-of join == pandas merge_asof (backward,
    inclusive) per key, for arbitrary key/time/value data."""
    left = spark.createDataFrame(
        [(k, t, v) for k, t, v in left_rows], "k long, t long, lv double"
    ).dropDuplicates(["k", "t"])
    right = spark.createDataFrame(
        [(k, t, p) for k, t, p in right_rows], "k long, t long, payload long"
    ).dropDuplicates(["k", "t"])
    got = {
        (r["k"], r["t"]): r["asof_payload"]
        for r in asof.asof_join(
            left, right, key="k", left_time="t", right_time="t",
            payload_cols=["payload"], how="left",
        ).collect()
    }
    lp = left.toPandas().sort_values("t").reset_index(drop=True)
    rp = right.toPandas().sort_values("t").reset_index(drop=True)
    merged = pd.merge_asof(lp, rp, on="t", by="k", direction="backward")
    for _, row in merged.iterrows():
        want = None if pd.isna(row["payload"]) else int(row["payload"])
        assert got[(row["k"], row["t"])] == want


@given(
    st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 100_000)),
        min_size=1,
        max_size=80,
        unique=True,
    ),
    st.integers(10, 5000),
)
@FAST
def test_sessionize_invariants(spark, user_ts, gap):
    """Session invariants for any event set and gap: (a) every event is
    in exactly one session, (b) consecutive events within a session gap
    ≤ gap, (c) gap between sessions of one user > gap."""
    rows = [
        (i, ts, uid, "view", 1.0, "{}")
        for i, (uid, ts) in enumerate(user_ts)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts_s long, user_id long, event_type string, "
        "value double, props string"
    ).select(
        "event_id",
        F.timestamp_seconds(F.col("ts_s")).alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    )
    out = events.sessionize(df, gap_seconds=gap).collect()
    assert sum(r["n_events"] for r in out) == len(rows)
    per_user: dict[int, list] = {}
    for r in out:
        per_user.setdefault(r["user_id"], []).append(r)
    by_user_ts: dict[int, list[int]] = {}
    for uid, ts in user_ts:
        by_user_ts.setdefault(uid, []).append(ts)
    for uid, sessions in per_user.items():
        ts_sorted = sorted(by_user_ts[uid])
        # rebuild expected session count by the gap rule
        expected_sessions = 1 + sum(
            1 for a, b in zip(ts_sorted, ts_sorted[1:]) if b - a > gap
        )
        assert len(sessions) == expected_sessions


@given(
    st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 40), st.integers(0, 23)),
        min_size=1,
        max_size=40,
    ),
    st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 40)),
        min_size=1,
        max_size=40,
    ),
    st.integers(1, 9),
)
@FAST
def test_interval_join_days_matches_bruteforce(spark, left_rows, right_rows, w):
    """The bucketized day-window equi-join == the brute-force range
    predicate right_date <= left_ts < right_date + w days, for any
    keys/days/hours and window width (boundary inclusivity exact)."""
    import datetime as dt

    base = dt.date(2025, 1, 1)
    left = spark.createDataFrame(
        [
            (i, k, dt.datetime(2025, 1, 1, h) + dt.timedelta(days=d))
            for i, (k, d, h) in enumerate(left_rows)
        ],
        "lid long, k long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (j, k, base + dt.timedelta(days=d))
            for j, (k, d) in enumerate(dict.fromkeys(right_rows))
        ],
        "rid long, k long, d date",
    )
    got = {
        (r["lid"], r["rid"])
        for r in asof.interval_join_days(
            left, right, key="k", left_time="ts", right_date="d",
            window_days=w, how="inner",
        ).collect()
    }
    want = set()
    for i, (lk, ld, lh) in enumerate(left_rows):
        ts = dt.datetime(2025, 1, 1, lh) + dt.timedelta(days=ld)
        for j, (rk, rd) in enumerate(dict.fromkeys(right_rows)):
            d0 = dt.datetime(2025, 1, 1) + dt.timedelta(days=rd)
            if lk == rk and d0 <= ts < d0 + dt.timedelta(days=w):
                want.add((i, j))
    assert got == want


@given(
    st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 2000)),
        min_size=1,
        max_size=40,
    ),
    st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 2000)),
        min_size=1,
        max_size=40,
    ),
    st.integers(1, 600),
    st.integers(0, 2),
)
@FAST
def test_interval_join_timestamps_matches_bruteforce(
    spark, left_rows, right_rows, window_s, bucket_mode
):
    """The banded timestamp range join (bucket + ONE residual
    predicate) == brute-force right_start <= t < right_start + w, for
    arbitrary second offsets, window widths, and the default
    window-wide bucket, a narrower one, AND a coarser-than-window one
    (the ADVICE r5 regression: a short window straddling one boundary
    of a wide bucket must still replicate into both)."""
    import datetime as dt

    from real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        asof,
    )

    base = dt.datetime(2025, 1, 1)
    bucket = {
        0: None,
        1: max(1, window_s // 3),
        2: window_s * 3 + 1,
    }[bucket_mode]
    left = spark.createDataFrame(
        [
            (i, k, base + dt.timedelta(seconds=s))
            for i, (k, s) in enumerate(left_rows)
        ],
        "lid long, k long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (j, k, base + dt.timedelta(seconds=s))
            for j, (k, s) in enumerate(dict.fromkeys(right_rows))
        ],
        "rid long, k long, start_ts timestamp",
    )
    rows = [
        (r["lid"], r["rid"])
        for r in asof.interval_join_timestamps(
            left, right, key="k", left_time="ts", right_start="start_ts",
            window_seconds=window_s, bucket_seconds=bucket,
        ).collect()
    ]
    got = set(rows)
    # each (left, right) match must be emitted exactly once — the left
    # row lives in ONE bucket, so replication can't duplicate matches
    assert len(rows) == len(got)
    want = set()
    for i, (lk, ls) in enumerate(left_rows):
        for j, (rk, rs) in enumerate(dict.fromkeys(right_rows)):
            if lk == rk and rs <= ls < rs + window_s:
                want.add((i, j))
    assert got == want


def test_interval_join_coarse_bucket_boundary(spark):
    """ADVICE r5 regression, pinned: bucket=10s, window=3s, right
    window [9, 12) must match left_time=10 — the left row lives in
    bucket 1, the right start in bucket 0, so the right side MUST
    replicate into bucket 1 even though window < bucket (the old
    ``w // b + 1`` replica count collapsed to 1 and lost this pair)."""
    import datetime as dt

    from real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        asof,
    )

    base = dt.datetime(2025, 1, 1)
    left = spark.createDataFrame(
        [(0, 1, base + dt.timedelta(seconds=10))],
        "lid long, k long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(0, 1, base + dt.timedelta(seconds=9))],
        "rid long, k long, start_ts timestamp",
    )
    got = asof.interval_join_timestamps(
        left, right, key="k", left_time="ts", right_start="start_ts",
        window_seconds=3, bucket_seconds=10,
    ).collect()
    assert [(r["lid"], r["rid"]) for r in got] == [(0, 0)]


@given(
    st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 2000)),
        min_size=1,
        max_size=30,
    ),
    st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 2000)),
        min_size=1,
        max_size=30,
    ),
    st.integers(1, 600),
    st.integers(0, 2),
)
@FAST
def test_interval_join_preceding_bounds_matches_bruteforce(
    spark, left_rows, right_rows, window_s, bucket_mode
):
    """bounds="(]" == brute-force right_start < t <= right_start + w
    — the preceding-window shape click_attribution rides. Covers the
    w-multiple-of-bucket edge where "(]" needs one replica more than
    "[)" (span end r + w inclusive lands in the next bucket)."""
    import datetime as dt

    from real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        asof,
    )

    base = dt.datetime(2025, 1, 1)
    bucket = {
        0: None,
        1: max(1, window_s // 3),
        2: window_s * 2 + 1,
    }[bucket_mode]
    left = spark.createDataFrame(
        [
            (i, k, base + dt.timedelta(seconds=s))
            for i, (k, s) in enumerate(left_rows)
        ],
        "lid long, k long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (j, k, base + dt.timedelta(seconds=s))
            for j, (k, s) in enumerate(dict.fromkeys(right_rows))
        ],
        "rid long, k long, start_ts timestamp",
    )
    rows = [
        (r["lid"], r["rid"])
        for r in asof.interval_join_timestamps(
            left, right, key="k", left_time="ts", right_start="start_ts",
            window_seconds=window_s, bucket_seconds=bucket, bounds="(]",
        ).collect()
    ]
    got = set(rows)
    assert len(rows) == len(got)
    want = set()
    for i, (lk, ls) in enumerate(left_rows):
        for j, (rk, rs) in enumerate(dict.fromkeys(right_rows)):
            if lk == rk and rs < ls <= rs + window_s:
                want.add((i, j))
    assert got == want


def test_click_attribution_banded_plan_spreads_hot_user(spark):
    """VERDICT r5 #4 acceptance: click_attribution's join key is
    (user_id, bucket), not user_id alone — ONE hot user's clicks land
    in as many shuffle groups as they have active time buckets.
    Asserted two ways: the physical plan's equi-join carries the _bkt
    column, and a user whose clicks span 5 days occupies >1 distinct
    bucket on the replicated side."""
    import datetime as dt

    from real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        events as ev,
    )

    base = dt.datetime(2024, 1, 1)
    rows = []
    # one hot user: clicks every 2h over 5 days + a purchase per day
    for h in range(0, 120, 2):
        rows.append((1000 + h, 7, "click", base + dt.timedelta(hours=h), 1.0))
    for d in range(5):
        rows.append(
            (2000 + d, 7, "purchase", base + dt.timedelta(days=d, hours=23), 5.0)
        )
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp, value double"
    )
    out = ev.click_attribution(df, window_hours=24)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "_bkt" in plan, "banded join key missing from physical plan"
    # every purchase sees exactly the 12 clicks of its preceding 24h
    # (strictly-before bound: the click AT the purchase hour minus 0 is
    # excluded only if simultaneous; none are here)
    got = {r["purchase_id"]: r["n_clicks"] for r in out.collect()}
    assert set(got) == {2000, 2001, 2002, 2003, 2004}
    assert all(n == 12 for n in got.values()), got
    # replicated click side spans multiple buckets for the hot user
    from real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        asof,
    )
    clicks = df.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("c_ts"), F.col("value").alias("c_value")
    )
    purchases = df.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", F.col("ts").alias("p_ts")
    )
    matched = asof.interval_join_timestamps(
        purchases, clicks, key="user_id", left_time="p_ts",
        right_start="c_ts", window_seconds=24 * 3600, bounds="(]",
    )
    n_buckets = (
        matched.select(F.floor(F.unix_timestamp("p_ts") / (24 * 3600)).alias("b"))
        .distinct()
        .count()
    )
    assert n_buckets >= 5


@given(
    st.lists(
        st.tuples(st.integers(0, 50), st.integers(-1000, 1000)),
        min_size=1,
        max_size=80,
    ),
    st.integers(2, 7),
    st.integers(1, 6),
)
@FAST
@pytest.mark.slow
def test_global_ntile_property_matches_window(spark, vals, k, ranges):
    """global_ntile == window NTILE over generated (heavily tied,
    negative-valued) populations for any tile count and range count —
    the shared-boundaries reconstruction is exact, not approximate."""
    from pyspark.sql import Window

    from real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators.olap_deep import (
        global_ntile,
    )

    rows = [(i, v1, float(v2)) for i, (v1, v2) in enumerate(vals)]
    df = spark.createDataFrame(rows, "id long, a long, b double")
    order = [F.asc("a"), F.desc("b"), F.asc("id")]
    got = {
        r["id"]: r["t"]
        for r in global_ntile(df, k, order, "t", num_ranges=ranges).collect()
    }
    want = {
        r["id"]: r["t"]
        for r in df.withColumn(
            "t", F.ntile(k).over(Window.orderBy(*order)).cast("long")
        ).collect()
    }
    assert got == want


@given(
    st.lists(st.integers(-500, 500), min_size=1, max_size=60),
    st.integers(1, 5),
)
@FAST
@pytest.mark.slow
def test_global_rank_property_matches_row_number(spark, vals, ranges):
    """global_rank == ROW_NUMBER over generated tied data for any
    range count; payload survives the join-back."""
    from pyspark.sql import Window

    from real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators.olap_deep import (
        global_rank,
    )

    rows = [(i, v, f"p{i}") for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "id long, v long, payload string")
    order = [F.desc("v"), F.asc("id")]
    got = {
        r["id"]: (r["rk"], r["payload"])
        for r in global_rank(df, order, "rk", num_ranges=ranges).collect()
    }
    want = {
        r["id"]: (r["rk"], r["payload"])
        for r in df.withColumn(
            "rk",
            F.row_number().over(Window.orderBy(*order)).cast("long"),
        ).collect()
    }
    assert got == want


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.text(
            alphabet=st.sampled_from("ab XY.Zéç\t\n"),
            min_size=0,
            max_size=40,
        ),
        min_size=1,
        max_size=8,
    )
)
@pytest.mark.slow
def test_token_event_grain_matches_independent_derivations(spark, texts):
    """Property: for arbitrary junk text (empty strings, whitespace
    runs, mixed case, unicode, punctuation), the unified token-event
    grain slices/re-aggregations are row-exact vs the THREE
    independent scan-based derivations they replace — the bit-parity
    contract over the whole input space, not just the fixture
    corpus."""
    from pyspark.sql import functions as F

    from real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.functions.core import (
        md5_long,
    )
    from real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        corpus_state,
        curation,
        text as text_ops,
    )

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    grain = corpus_state.token_event_counts(docs, shingle_n=5)
    key = lambda df: sorted(tuple(r) for r in df.collect())

    term_want = (
        docs.select(
            "doc_id",
            F.explode(text_ops.tokens(F.lower(F.col("text")))).alias("term"),
        )
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    assert key(corpus_state.term_state_from_event_counts(grain)) == key(
        term_want
    )

    feat_want = (
        curation.hashed_ngram_features(docs, "doc_id", 64)
        .groupBy("doc_id", "bucket")
        .agg(F.count(F.lit(1)).alias("c_doc"))
    )
    assert key(
        corpus_state.feature_state_from_event_counts(grain, n_buckets=64)
    ) == key(feat_want)

    t = text_ops.tokens(F.lower(F.col("text")))
    sz = F.size(t)
    sh = t
    for j in range(1, 5):
        shifted = F.slice(t, j + 1, F.greatest(sz - j, F.lit(0)))
        sh = F.zip_with(sh, shifted, lambda a, b: F.concat_ws(" ", a, b))
    full = F.slice(sh, 1, F.greatest(sz - 4, F.lit(0)))
    shingle_want = (
        docs.select("doc_id", t.alias("_t"), full.alias("_sh"))
        .filter(F.size("_t") >= 5)
        .select("doc_id", F.explode("_sh").alias("_s"))
        .select("doc_id", md5_long(F.col("_s")).alias("_h"))
        .groupBy("doc_id", "_h")
        .agg(F.count(F.lit(1)).alias("_tf"))
    )
    assert key(corpus_state.shingle_state_from_event_counts(grain)) == key(
        shingle_want
    )


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=30),  # query_id
            st.integers(min_value=0, max_value=15),  # cell
        ),
        min_size=1,
        max_size=120,
    ),
    st.integers(min_value=1, max_value=16),
)
@settings(deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_cell_affine_groups_invariants(rows, max_cells):
    """The batched-serving router rule holds for ANY probe table:
    every query lands in exactly one group, each group's cell union is
    bounded by max_cells and covers every member's probes, the output
    is deterministic under input permutation, and the only rejection
    is a single query probing more than max_cells cells."""
    from real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators.similarity import (
        cell_affine_groups,
    )

    per_q: dict[int, set[int]] = {}
    for qid, cell in rows:
        per_q.setdefault(qid, set()).add(cell)
    oversized = any(len(cs) > max_cells for cs in per_q.values())
    if oversized:
        import pytest

        with pytest.raises(ValueError, match="raise max_cells"):
            cell_affine_groups(rows, max_cells)
        return
    groups = cell_affine_groups(rows, max_cells)
    seen: list[int] = []
    for qids, cells in groups:
        assert len(cells) <= max_cells
        assert qids == sorted(qids) and cells == sorted(cells)
        for qid in qids:
            assert per_q[qid] <= set(cells), (
                "a group must cover every member's probe cells"
            )
        seen.extend(qids)
    assert sorted(seen) == sorted(per_q), (
        "every query in exactly one group"
    )
    # deterministic under permutation
    assert cell_affine_groups(list(reversed(rows)), max_cells) == groups


@given(
    st.lists(
        st.tuples(st.integers(0, 4), st.integers(0, 30)),
        min_size=1,
        max_size=60,
        unique=True,
    ),
    st.lists(
        st.tuples(st.integers(0, 4), st.integers(0, 30)),
        max_size=60,
        unique=True,
    ),
    st.integers(1, 6),
)
@FAST
def test_recall_report_hits_are_exact_intersections(
    spark, exact_pairs, approx_pairs, k
):
    """recall_report's hits column equals |exact ∩ approx| per query
    and recall is hits/k, for ARBITRARY (query, neighbor) sets — not
    just well-formed top-k results."""
    from real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators.similarity import (
        recall_report,
    )

    exact = spark.createDataFrame(
        exact_pairs, "query_id long, neighbor_id long"
    )
    approx = spark.createDataFrame(
        approx_pairs or [(-(10 ** 6), -(10 ** 6))],
        "query_id long, neighbor_id long",
    )
    got = {
        r.query_id: (r.hits, r.recall_at_k)
        for r in recall_report(exact, approx, k=k).collect()
    }
    aset = set(approx_pairs)
    want_hits: dict[int, int] = {}
    for q, n in exact_pairs:
        want_hits.setdefault(q, 0)
        want_hits[q] += (q, n) in aset
    assert set(got) == set(want_hits)
    for q, hits in want_hits.items():
        assert got[q][0] == hits
        assert got[q][1] == math.floor(hits / k * 1e4 + 0.5) / 1e4
