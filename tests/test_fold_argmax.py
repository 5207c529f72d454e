"""Optimization r16 batch 2 — the per-row fold rewrites must be
DECISION-IDENTICAL to the aggregates/windows they replaced.

The IVF/PQ tier's coarse assignment, PQ encode, and probe selection
moved from (broadcast-join fan-out + struct-ordered min/max aggregate
/ row_number window) to per-row ``array_max`` / ``sort_array + slice``
folds over a one-row cells array (``similarity._cells_array`` /
``_argmax_cell`` / ``_top_cells``). The values ride Spark's struct
total order in BOTH forms, so winners must match bit-for-bit —
including the edge case a naive rewrite could get wrong: cosine
ties, which must resolve to the LOWEST cid exactly as the old
``row_number`` / struct-max tie-break did. (Zero-norm vectors are
unreachable either way: the session runs ANSI mode, where a
zero-norm cosine raises DIVIDE_BY_ZERO in BOTH the old and the new
form — parity holds trivially there.)

Plus the plan-shape pins the optimization claims ride on: no
SortAggregate anywhere in the rewritten tier, and the fit paths'
assignment/encode running as projections (no n·k fan-out aggregate).
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
    similarity,
)
from real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.plans import (
    formatted_plan,
)
from real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.queries import (
    QUERIES,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark import (
        get_spark,
    )

    s = get_spark("test-fold-argmax")
    s.conf.set("spark.sql.session.timeZone", "UTC")
    return s


def _corpus(spark):
    # 3 centroids; vectors engineered for exact ties:
    #  - id 0/1: EXACT cosine ties between cid 1 and cid 2 (colinear
    #    centroids) -> must pick cid 1 (lowest id wins)
    #  - id 3/4: plain distinct winners (incl. a negative-cosine one)
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0]), (2, [0.0, 2.0])],
        "cid long, centroid_vec array<double>",
    )
    vecs = spark.createDataFrame(
        [
            (0, [0.0, 3.0]),
            (1, [0.0, 0.5]),
            (3, [1.0, 0.1]),
            (4, [-1.0, 0.0]),
        ],
        "vec_id long, embedding array<double>",
    )
    return cents, vecs


def test_assignment_fold_matches_window_reference(spark):
    cents, vecs = _corpus(spark)
    got = {
        r["vec_id"]: r["cluster_id"]
        for r in similarity.ivf_list_assign(vecs, cents).collect()
    }
    # reference: the OLD formulation — explode every (vec, cid) pair,
    # row_number over (cosine DESC, cid ASC)
    scored = vecs.join(cents).select(
        "vec_id",
        "cid",
        similarity.cosine(
            similarity.as_double(F.col("embedding")), F.col("centroid_vec")
        ).alias("s"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("s"), F.asc("cid"))
    ref = {
        r["vec_id"]: r["cid"]
        for r in scored.withColumn("rk", F.row_number().over(w))
        .filter("rk = 1")
        .collect()
    }
    assert got == ref
    # the engineered tie actually hits: colinear centroids -> lowest cid
    assert got[0] == 1 and got[1] == 1


def test_probe_slice_matches_window_reference(spark):
    cents, vecs = _corpus(spark)
    got = {
        (r["query_id"], r["cluster_id"])
        for r in similarity.ivf_probe_assignments(
            vecs, cents, n_probe=2
        ).collect()
    }
    scored = vecs.join(cents).select(
        F.col("vec_id").alias("query_id"),
        "cid",
        similarity.cosine(
            similarity.as_double(F.col("embedding")), F.col("centroid_vec")
        ).alias("s"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("s"), F.asc("cid"))
    ref = {
        (r["query_id"], r["cid"])
        for r in scored.withColumn("rk", F.row_number().over(w))
        .filter("rk <= 2")
        .collect()
    }
    assert got == ref


def test_rewritten_tier_plans_no_sortaggregate(spark):
    # the optimization's plan claim, pinned: the struct-ordered
    # min/max aggregates (which plan as SortAggregate) are gone from
    # the whole rewritten tier
    for name in (
        "ann_ivf_topk",
        "ann_pq_topk",
        "ann_ivfpq_topk",
        "ivf_probe_tuning",
        "ann_recall_report",
    ):
        plan = formatted_plan(QUERIES[name](spark, SF))
        assert "SortAggregate" not in plan, f"{name} regressed:\n{plan}"


def test_fold_tier_exchange_budget(spark):
    # regression guard on the plan SHAPE, not a tight pin: exchange
    # counts at this sf include the scale-gated spread_small_input
    # repartitions (which fire on one-file tiny inputs and are no-ops
    # at scale), so the budget below is loose — what it guards is a
    # fall-back to the old shapes: ivf_probe_tuning's per-budget
    # ivf_topk loop planned 20 exchanges, ann_ivfpq_topk's struct-agg
    # fit 7 exchanges + 24 SortAggregates BEFORE the r16 rewrite.
    from real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.plans import (
        count_exchanges,
    )

    for name, budget in (("ann_ivfpq_topk", 8), ("ivf_probe_tuning", 10)):
        df = QUERIES[name](spark, SF)
        n = count_exchanges(df)
        assert n <= budget, f"{name}: {n} exchanges\n{formatted_plan(df)}"
