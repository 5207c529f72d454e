"""IVFPQ rerank (FAISS IndexRefineFlat pattern), hard-negative
mining, and the recall report.

Value contracts:
* probing EVERY cell with a corpus-sized shortlist makes rerank
  exactly brute force (the refine stage is the exact metric);
* with production settings the rerank winners are a subset of the ADC
  shortlist and their cosine_sim is the EXACT pairwise cosine;
* hard negatives never share the query's label;
* recall_report counts overlap correctly and reranking never lowers
  recall on the candidate set (it reorders by the true metric).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
    similarity,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def test_rerank_probe_all_full_shortlist_is_brute_force(spark, emb):
    """n_probe = n_clusters (every cell probed) + corpus-sized
    shortlist ⇒ the refine stage scores every candidate exactly, so
    the result must equal brute_force_topk row-for-row."""
    q = emb.filter(F.col("vec_id") < 5)
    exact = similarity.brute_force_topk(emb, q, k=5)
    rer = similarity.ivfpq_rerank_topk(
        emb, q, shortlist=600, k=5, n_probe=16, n_clusters=16,
    ).drop("adc_sim")
    assert exact.exceptAll(rer).count() == 0
    assert rer.exceptAll(exact).count() == 0


def test_rerank_winners_come_from_shortlist_with_exact_scores(spark, emb):
    q = emb.filter(F.col("vec_id") < 5)
    short = similarity.ivfpq_topk(emb, q, k=20)
    rer = similarity.ivfpq_rerank_topk(emb, q, shortlist=20, k=5)
    # subset of the shortlist, and adc_sim is the shortlist's estimate
    missing = rer.join(
        short.select(
            "query_id", "neighbor_id",
            F.col("cosine_sim").alias("short_adc"),
        ),
        ["query_id", "neighbor_id"],
        "left",
    ).filter(
        F.col("short_adc").isNull()
        | (F.col("short_adc") != F.col("adc_sim"))
    )
    assert missing.count() == 0
    # cosine_sim is the exact pairwise cosine, recomputed independently
    pairs = (
        rer.alias("r")
        .join(
            emb.select(
                F.col("vec_id").alias("query_id"),
                similarity.as_double("embedding").alias("qv"),
            ),
            "query_id",
        )
        .join(
            emb.select(
                F.col("vec_id").alias("neighbor_id"),
                similarity.as_double("embedding").alias("cv"),
            ),
            "neighbor_id",
        )
        .select(
            "cosine_sim",
            F.round(
                similarity.cosine(F.col("qv"), F.col("cv")), 6
            ).alias("direct"),
        )
    )
    bad = pairs.filter(
        F.abs(F.col("cosine_sim") - F.col("direct")) > 1e-9
    )
    assert bad.count() == 0


def test_hard_negatives_never_share_the_query_label(spark, emb):
    q = emb.filter(F.col("vec_id") < 10)
    neg = similarity.ivfpq_rerank_topk(
        emb, q, shortlist=40, k=5, exclude_same_label=True,
    )
    labels = emb.select("vec_id", "label")
    joined = (
        neg.join(
            labels.select(
                F.col("vec_id").alias("query_id"),
                F.col("label").alias("qlab"),
            ),
            "query_id",
        )
        .join(
            labels.select(
                F.col("vec_id").alias("neighbor_id"),
                F.col("label").alias("nlab"),
            ),
            "neighbor_id",
        )
    )
    assert joined.filter(F.col("qlab") == F.col("nlab")).count() == 0
    per_q = neg.groupBy("query_id").count().agg(F.max("count")).first()[0]
    assert per_q <= 5


def test_recall_report_exact_vs_itself_is_one(spark, emb):
    q = emb.filter(F.col("vec_id") < 5)
    exact = similarity.brute_force_topk(emb, q, k=5)
    rep = similarity.recall_report(exact, exact, k=5).collect()
    assert len(rep) == 5
    assert all(r.hits == 5 and r.recall_at_k == 1.0 for r in rep)


def test_recall_report_counts_known_overlap(spark):
    exact = spark.createDataFrame(
        [(1, 10), (1, 11), (1, 12), (2, 20), (2, 21), (2, 22)],
        "query_id long, neighbor_id long",
    )
    approx = spark.createDataFrame(
        [(1, 10), (1, 99), (1, 12), (2, 98), (2, 97), (2, 96)],
        "query_id long, neighbor_id long",
    )
    rows = {
        r.query_id: r
        for r in similarity.recall_report(exact, approx, k=3).collect()
    }
    assert rows[1].hits == 2 and rows[1].recall_at_k == pytest.approx(0.6667)
    assert rows[2].hits == 0 and rows[2].recall_at_k == 0.0


def test_contrastive_triplets_label_contract(spark, emb):
    """Positives share the anchor's label, negatives never do, the
    margin is the round-6 sim gap, and every emitted anchor has both
    sides."""
    q = emb.filter(F.col("vec_id") < 10)
    trip = similarity.contrastive_triplets(emb, q, shortlist=40)
    labels = emb.select("vec_id", "label")
    joined = (
        trip.join(
            labels.select(
                F.col("vec_id").alias("anchor_id"),
                F.col("label").alias("alab"),
            ),
            "anchor_id",
        )
        .join(
            labels.select(
                F.col("vec_id").alias("positive_id"),
                F.col("label").alias("plab"),
            ),
            "positive_id",
        )
        .join(
            labels.select(
                F.col("vec_id").alias("negative_id"),
                F.col("label").alias("nlab"),
            ),
            "negative_id",
        )
    )
    rows = joined.collect()
    assert rows, "no triplets emitted"
    for r in rows:
        assert r.plab == r.alab
        assert r.nlab != r.alab
        assert r.positive_id != r.anchor_id
        assert r.margin == pytest.approx(
            round(r.pos_sim - r.neg_sim, 6), abs=1e-9
        )


def test_contrastive_triplets_sides_come_from_rerank_shortlist(spark, emb):
    """Each side is the FIRST candidate of its label class in the
    rerank-ranked shortlist — recomputed independently from the
    rerank output."""
    q = emb.filter(F.col("vec_id") < 10)
    trip = {
        r.anchor_id: r
        for r in similarity.contrastive_triplets(
            emb, q, shortlist=40
        ).collect()
    }
    ranked = similarity.ivfpq_rerank_topk(emb, q, shortlist=40, k=40)
    labs = {
        r.vec_id: r.label for r in emb.select("vec_id", "label").collect()
    }
    by_anchor: dict[int, list] = {}
    for r in ranked.collect():
        by_anchor.setdefault(r.query_id, []).append(r)
    for anchor, rows in by_anchor.items():
        rows.sort(key=lambda r: (-r.cosine_sim, r.neighbor_id))
        pos = next(
            (r for r in rows if labs[r.neighbor_id] == labs[anchor]), None
        )
        neg = next(
            (r for r in rows if labs[r.neighbor_id] != labs[anchor]), None
        )
        if pos is None or neg is None:
            assert anchor not in trip
            continue
        assert trip[anchor].positive_id == pos.neighbor_id
        assert trip[anchor].negative_id == neg.neighbor_id


def test_matryoshka_full_dim_row_is_perfect(spark, emb):
    """The full-dimension row is recall 1.0 by construction (it IS
    the baseline), every row's hits are bounded by |q|·k, and
    mean_recall is the exact integer ratio."""
    q = emb.filter(F.col("vec_id") < 10)
    rows = {
        r.trunc_dim: r
        for r in similarity.matryoshka_recall(
            emb, q, dims=(16, 64), k=5
        ).collect()
    }
    assert rows[64].mean_recall == 1.0
    assert rows[64].total_hits == 50
    for r in rows.values():
        assert r.n_queries == 10
        assert 0 <= r.total_hits <= 50
        assert r.mean_recall == pytest.approx(
            round(r.total_hits / 50.0, 4), abs=1e-12
        )


def test_ivf_cell_stats_from_landed_lists_matches_inplan(spark, emb):
    """The index-health report scored FROM the assignment table
    (zero embedding scans — the production path) must equal the
    in-plan assignment form row-for-row, and its counts must sum to
    the corpus."""
    cent = emb.filter(F.col("vec_id") % 29 == 0).orderBy("vec_id").limit(
        16
    ).select(
        F.col("vec_id").alias("cid"),
        similarity.as_double("embedding").alias("centroid_vec"),
    )
    lists = similarity.ivf_list_assign(emb, cent)
    via_lists = similarity.ivf_cell_stats(emb, centroids=cent, lists=lists)
    inplan = similarity.ivf_cell_stats(emb, n_clusters=16, stride=29)
    assert sorted(map(tuple, via_lists.collect())) == sorted(
        map(tuple, inplan.collect())
    )
    total = via_lists.agg(F.sum("n_vectors")).first()[0]
    assert total == emb.count()


def test_ivf_cell_stats_lists_only_universe_from_lists(spark, emb):
    """lists WITHOUT centroids (ADVICE r14): the cell universe must
    come from the lists' own distinct cluster_id set — never the
    strided default, which may be a DIFFERENT quantizer than the one
    that produced the landed assignment. Occupied-cell rows must match
    the centroids+lists form exactly; explicit-0 empty cells are only
    representable when centroids are passed."""
    # a quantizer the strided default would NOT pick (stride 7, 8 cells)
    cent = emb.filter(F.col("vec_id") % 7 == 0).orderBy("vec_id").limit(
        8
    ).select(
        F.col("vec_id").alias("cid"),
        similarity.as_double("embedding").alias("centroid_vec"),
    )
    lists = similarity.ivf_list_assign(emb, cent)
    with_cent = similarity.ivf_cell_stats(emb, centroids=cent, lists=lists)
    lists_only_rows = similarity.ivf_cell_stats(emb, lists=lists).collect()
    occupied = with_cent.filter(F.col("n_vectors") > 0)
    # counts and corpus fractions agree with the centroids+lists form
    # on every occupied cell (imbalance is normalized by each form's
    # own universe size, so it is checked arithmetically below)
    key = lambda rows: sorted(
        (r["cluster_id"], r["n_vectors"], r["cell_frac"]) for r in rows
    )
    assert key(lists_only_rows) == key(occupied.collect())
    # universe is exactly the lists' cells
    cells = {
        r["cluster_id"]
        for r in lists.select("cluster_id").distinct().collect()
    }
    assert {r["cluster_id"] for r in lists_only_rows} == cells
    tot = sum(r["n_vectors"] for r in lists_only_rows)
    for r in lists_only_rows:
        assert r["imbalance"] == pytest.approx(
            round(r["n_vectors"] * len(cells) / tot, 4), abs=1e-12
        )


def test_matryoshka_empty_dims_raises(spark, emb):
    q = emb.filter(F.col("vec_id") < 3)
    with pytest.raises(ValueError, match="dims must be non-empty"):
        similarity.matryoshka_recall(emb, q, dims=())


def test_mmr_topk_value_contracts(spark, emb):
    """MMR's value contracts: λ=1 reduces to plain rerank order (the
    redundancy term vanishes); picks never repeat within a query;
    rank-1 is always the top-relevance candidate; and at λ<1 the FULL
    greedy trajectory — picks, ranks, AND selection scores
    λ·rel − (1−λ)·max-sim-to-selected — is recomputed by hand in
    Python (Decimal products, the operator's own floor-half-up round,
    cosine replicated as the same left-fold) and must match
    bit-exactly."""
    q = emb.filter(F.col("vec_id") < 5)
    rer = similarity.ivfpq_rerank_topk(emb, q, shortlist=20, k=20)
    lam1 = similarity.mmr_topk(emb, q, k=5, shortlist=20, lam=1.0)
    a = sorted(
        (r["query_id"], r["mmr_rank"], r["neighbor_id"])
        for r in lam1.collect()
    )
    b = sorted(
        (r["query_id"], r["sim_rank"], r["neighbor_id"])
        for r in rer.filter(F.col("sim_rank") <= 5).collect()
    )
    assert a == b

    lam = 0.7
    div = similarity.mmr_topk(emb, q, k=5, shortlist=20, lam=lam)
    rows = div.collect()
    per_q = {}
    for r in rows:
        per_q.setdefault(r["query_id"], []).append(r)
    top_rel = {
        r["query_id"]: r["neighbor_id"]
        for r in rer.filter(F.col("sim_rank") == 1).collect()
    }
    for qid, rs in per_q.items():
        nids = [r["neighbor_id"] for r in rs]
        assert len(nids) == len(set(nids))  # no repeats
        first = min(rs, key=lambda r: r["mmr_rank"])
        assert first["neighbor_id"] == top_rel[qid]

    # --- by-hand greedy recompute (the docstring's promise) --------
    from decimal import Decimal
    from math import floor, sqrt

    def det_round6(x: float) -> float:
        return floor(x * 1e6 + 0.5) / 1e6

    def fold_cosine(va, vb) -> float:
        # replicate F.aggregate's sequential left fold exactly
        dot = 0.0
        na = 0.0
        nb = 0.0
        for x, y in zip(va, vb):
            dot = dot + x * y
        for x in va:
            na = na + x * x
        for y in vb:
            nb = nb + y * y
        return dot / (sqrt(na) * sqrt(nb))

    rel = {}  # (qid, nid) -> rel, from the refine tier (its own tests)
    for r in rer.collect():
        rel[(r["query_id"], r["neighbor_id"])] = r["cosine_sim"]
    vecs = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in emb.collect()
    }
    lam_d = Decimal(str(lam))
    om_d = Decimal(1) - lam_d
    dec6 = lambda x: Decimal(f"{x:.6f}")
    expect = []
    for qid in sorted({k[0] for k in rel}):
        cands = sorted(n for (qq, n) in rel if qq == qid)
        psim = {
            (a_, b_): det_round6(fold_cosine(vecs[a_], vecs[b_]))
            for a_ in cands
            for b_ in cands
            if a_ != b_
        }
        selected: list[int] = []
        for rank in range(1, 6):
            best = None
            for c in cands:
                if c in selected:
                    continue
                if selected:
                    ms = max(psim[(c, s)] for s in selected)
                    score = det_round6(
                        float(
                            lam_d * dec6(rel[(qid, c)])
                            - om_d * dec6(ms)
                        )
                    )
                else:
                    score = det_round6(
                        float(lam_d * dec6(rel[(qid, c)]))
                    )
                key = (-score, c)
                if best is None or key < best[0]:
                    best = (key, c, score)
            selected.append(best[1])
            expect.append((qid, rank, best[1], best[2]))
    got = sorted(
        (r["query_id"], r["mmr_rank"], r["neighbor_id"], r["mmr_score"])
        for r in rows
    )
    assert got == sorted(expect)


def test_ivf_probe_tuning_value_contracts(spark, emb):
    """The n_probe tuning table's value contracts: candidate sets nest
    as n_probe grows and every candidate is exactly scored, so recall
    is NON-DECREASING in n_probe; probing every cell (n_probe =
    n_clusters) IS brute force, so that row's recall is exactly 1.0;
    read_fraction is the arithmetic n_probe/n_clusters."""
    q = emb.filter(F.col("vec_id") < 10)
    rows = {
        r["n_probe"]: r
        for r in similarity.ivf_probe_tuning(
            emb, q, n_probes=(1, 4, 16), k=5
        ).collect()
    }
    assert rows[16].mean_recall == 1.0
    assert rows[16].total_hits == 50
    hits = [rows[p].total_hits for p in (1, 4, 16)]
    assert hits == sorted(hits)
    for p in (1, 4, 16):
        assert rows[p].n_queries == 10
        assert rows[p].read_fraction == pytest.approx(p / 16.0)
    with pytest.raises(ValueError, match="n_probes must be non-empty"):
        similarity.ivf_probe_tuning(emb, q, n_probes=())


def test_rerank_recall_not_below_adc_recall(spark, emb):
    """Refinement reorders the candidate set by the TRUE metric, so
    recall@k against the exact baseline cannot drop vs ranking the
    same candidates by their quantized ADC estimate."""
    q = emb.filter(F.col("vec_id") < 10)
    exact = similarity.brute_force_topk(emb, q, k=5)
    adc = similarity.ivfpq_topk(emb, q, k=5)
    rer = similarity.ivfpq_rerank_topk(emb, q, shortlist=20, k=5)
    mean = lambda rep: (
        similarity.recall_report(exact, rep, k=5)
        .agg(F.avg("recall_at_k"))
        .first()[0]
    )
    assert mean(rer) >= mean(adc)


def test_choose_probe_budget_rule():
    """The deployment rule in isolation: cheapest budget meeting the
    floor; best-recall (ties → cheaper) fallback when nothing meets
    it; empty table refuses loudly."""
    rows = [
        {"n_probe": 1, "mean_recall": 0.82},
        {"n_probe": 2, "mean_recall": 0.84},
        {"n_probe": 4, "mean_recall": 0.92},
        {"n_probe": 8, "mean_recall": 0.96},
    ]
    assert similarity.choose_probe_budget(rows, 0.9) == 4
    assert similarity.choose_probe_budget(rows, 0.5) == 1
    assert similarity.choose_probe_budget(rows, 0.99) == 8  # fallback
    tied = [
        {"n_probe": 2, "mean_recall": 0.8},
        {"n_probe": 8, "mean_recall": 0.8},
    ]
    assert similarity.choose_probe_budget(tied, 0.99) == 2
    with pytest.raises(ValueError, match="tuning table is empty"):
        similarity.choose_probe_budget([], 0.9)


def test_ivf_tuned_topk_serves_at_chosen_budget(spark, emb):
    """ivf_tuned_topk = ivf_topk at exactly the budget the tuning
    table prescribes, plus the self-describing n_probe_used column."""
    q = emb.filter(F.col("vec_id") < 10)
    tuning = similarity.ivf_probe_tuning(
        emb, q, n_probes=(1, 4, 16), k=5
    )
    trows = {r["n_probe"]: r["mean_recall"] for r in tuning.collect()}
    floor = 0.9
    expected = similarity.choose_probe_budget(
        [{"n_probe": p, "mean_recall": r} for p, r in trows.items()],
        floor,
    )
    tuned = similarity.ivf_tuned_topk(
        emb, q, tuning, recall_floor=floor, k=5
    )
    rows = tuned.collect()
    assert {r["n_probe_used"] for r in rows} == {expected}
    plain = similarity.ivf_topk(emb, q, n_probe=expected, k=5)
    key = lambda rs: sorted(
        (r["query_id"], r["sim_rank"], r["neighbor_id"], r["cosine_sim"])
        for r in rs
    )
    assert key(rows) == key(plain.collect())


def test_ivf_filtered_probe_all_is_filtered_brute_force(spark, emb):
    """Filtered ANN value contract: probing EVERY cell makes the
    filtered serve exactly brute force over the predicate-surviving
    corpus — pre-filtering never under-fills k (the post-filter
    failure mode) and never surfaces a non-matching row."""
    q = emb.filter(F.col("vec_id") < 5)
    pred = F.col("label") >= 5
    got = similarity.ivf_topk(
        emb, q, n_probe=16, n_clusters=16, k=5, corpus_filter=pred
    )
    exact = similarity.brute_force_topk(emb.filter(pred), q, k=5)
    key = lambda df: sorted(map(tuple, df.collect()))
    assert key(got) == key(exact)
    labels = {r["vec_id"]: r["label"] for r in emb.collect()}
    for r in got.collect():
        assert labels[r["neighbor_id"]] >= 5


def test_ivf_filtered_state_pushes_predicate_into_zone_scan(
    spark, emb, tmp_path
):
    """The production filtered serve: label lands IN the lists zone
    (keep_cols), and the serve's predicate reaches the zone scan's
    PushedFilters while the probe join still DPP-prunes — pushdown ×
    partition pruning composed on one scan, no join-back. Plan is
    inspected BEFORE execution (post-collect AQE plans duplicate
    FileScans)."""
    cents = emb.filter(F.col("vec_id") % 29 == 0).orderBy(
        "vec_id"
    ).limit(16).select(
        F.col("vec_id").alias("cid"),
        similarity.as_double("embedding").alias("centroid_vec"),
    )
    lists = similarity.ivf_list_assign(
        emb, cents, keep_cols=("label",)
    )
    assert lists.columns == ["vec_id", "cluster_id", "embedding", "label"]
    zone = str(tmp_path / "lists")
    lists.write.partitionBy("cluster_id").parquet(zone)
    zlists = spark.read.schema(
        "vec_id long, embedding array<double>, label int, cluster_id long"
    ).parquet(zone)
    served = similarity.ivf_topk(
        emb, emb.filter(F.col("vec_id") < 5), k=5,
        centroids=cents, lists=zlists,
        corpus_filter=F.col("label") >= 5,
    )
    plan = served._jdf.queryExecution().executedPlan().toString()
    scan = [
        ln for ln in plan.splitlines()
        if "PushedFilters" in ln and "label" in ln
    ]
    assert scan, f"label predicate did not reach the zone scan:\n{plan[:3000]}"
    assert "dynamicpruning" in plan.lower() or "PartitionFilters: [" in plan, (
        "probe join lost its partition pruning"
    )
    # and the landed-zone serve agrees with the in-plan form
    inplan = similarity.ivf_topk(
        emb, emb.filter(F.col("vec_id") < 5), k=5,
        centroids=cents, corpus_filter=F.col("label") >= 5,
    )
    key = lambda df: sorted(map(tuple, df.collect()))
    assert key(served) == key(inplan)
