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
    outw = edges.groupBy("src").agg(F.sum("w").alias("_ow"))
    nodes = edges.select(F.col("src").alias("node")).distinct()
    n = nodes.count()
    e = edges.join(outw, "src").select(
        "src",
        "dst",
        (F.col("w").cast("double") / F.col("_ow").cast("double")).alias("_p"),
    )
    base = F.lit((1.0 - damping) / float(n))
    ranks = nodes.withColumn("r", F.lit(1.0 / float(n)))
    for _ in range(iterations):
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
        ranks = nodes.join(contrib, "node", "left").select(
            "node",
            det_round(
                base
                + F.lit(damping) * F.coalesce(F.col("_s"), F.lit(0.0)),
                12,
            ).alias("r"),
        )
    return ranks.select("node", det_round(F.col("r"), 9).alias("pagerank"))
