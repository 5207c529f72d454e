"""Deduplication operators — exact and near-dup — over ``documents``.

Extension surface (BASELINE.json north star): the reference has no
dedup at all; these are designed for the 100 TB training-data case.

Scale design notes, per operator:

* **exact**: group on a 16-byte md5 fingerprint, not the document body
  — the shuffle moves ~48 bytes/doc instead of the full text. One
  shuffle, map-side partial aggregation.
* **MinHash + LSH**: per-doc signature is a narrow map (no shuffle);
  banding turns the O(n²) pair space into per-bucket joins. The only
  shuffle is the bucket-key groupBy, whose fan-in is controlled by
  ``n_bands``. Candidate pairs are then verified with exact Jaccard on
  the (small) candidate set only.
* **SimHash**: one 64-bit signature per doc via xxhash64 of tokens;
  near-dups = identical band of high bits — again a hash-groupBy, no
  pairwise compare until the bucket.
* **n-gram Jaccard**: exact pairwise similarity, bucketed by a
  blocking key (``lang``) so the quadratic term is per-block; the
  brute-force baseline the LSH variants approximate.

All token/shingle definitions reuse ``text.tokens`` so every dedup
flavor agrees on tokenization.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.core import det_round, ratio
from .text import tokens


def exact_dedup(documents: DataFrame) -> DataFrame:
    """Exact duplicate groups keyed by normalized-text md5: canonical
    (min) doc_id + copy count per distinct content."""
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    return (
        documents.select(F.md5(norm.cast("binary")).alias("fingerprint"), "doc_id")
        .groupBy("fingerprint")
        .agg(
            F.min("doc_id").alias("canonical_id"),
            F.count("*").cast("long").alias("n_copies"),
        )
    )


def shingles(text_col: Column, k: int = 3) -> Column:
    """Word k-shingles as a distinct array.

    Formulated as a ``zip_with`` chain over shifted slices — NOT as
    ``transform(sequence(...), i -> element_at(t, i+j))`` — because an
    array expression referenced *inside* a higher-order-function lambda
    is re-evaluated per element (HOFs are interpreted; codegen
    subexpression elimination does not reach lambda bodies), turning
    tokenization into O(n_shingles × k) regex splits per row (measured
    ~8 s for 5k docs). Here the token array is only referenced at row
    level: k-1 slices + one zip chain ⇒ O(k) evaluations per row.
    """
    t = tokens(F.lower(text_col))
    n = F.size(t)
    # sh[i] after the chain = t[i] ⊕ t[i+1] ⊕ … ⊕ t[i+k-1]; the last
    # k-1 entries are partial (zip_with null-pads, concat_ws drops
    # nulls) and are sliced away below.
    sh = t
    for j in range(1, k):
        shifted = F.slice(t, j + 1, F.greatest(n - j, F.lit(0)))
        sh = F.zip_with(sh, shifted, lambda a, b: F.concat_ws(" ", a, b))
    full = F.slice(sh, 1, F.greatest(n - (k - 1), F.lit(0)))
    return F.array_distinct(
        F.when(n >= k, full).otherwise(F.array(F.concat_ws(" ", t)))
    )


def minhash_signatures(
    documents: DataFrame, num_hashes: int = 32, k: int = 3
) -> DataFrame:
    """Per-doc MinHash signature via explode → per-shingle base hash →
    groupBy-min of ``num_hashes`` derived hashes.

    Why not an array expression per row: Catalyst's CollapseProject
    re-inlines a shingle-array column into every one of the
    ``num_hashes`` ``transform``s, re-running tokenize→shingle→distinct
    32× per row (measured 18 s for 5k docs). The exploded form hashes
    each shingle **once** (xxhash64), derives the hash family from that
    single 64-bit value (xxhash64(h, i) — no string re-hash), and lets
    the aggregation's map-side combine shrink the shuffle to
    |docs| × num_hashes longs — the shape that survives 100 TB.
    """
    per_shingle = documents.select(
        "doc_id", F.explode(shingles(F.col("text"), k)).alias("shingle")
    ).select("doc_id", F.xxhash64("shingle").alias("h"))
    sig = per_shingle.groupBy("doc_id").agg(
        *[
            F.min(F.xxhash64("h", F.lit(i))).alias(f"mh_{i}")
            for i in range(num_hashes)
        ]
    )
    return sig.select(
        "doc_id",
        F.array(*[f"mh_{i}" for i in range(num_hashes)]).alias("signature"),
    )


def minhash_lsh_candidates(
    documents: DataFrame,
    num_hashes: int = 32,
    n_bands: int = 8,
    k: int = 3,
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """MinHash-LSH near-dup pairs: band the signature, bucket-join on
    (band_id, band_hash), verify candidates with exact Jaccard.

    Returns (doc_a, doc_b, jaccard) with doc_a < doc_b and jaccard ≥
    threshold. The pairwise explode only ever happens inside a bucket.
    """
    rows_per_band = num_hashes // n_bands
    sigs = minhash_signatures(documents, num_hashes, k)
    banded = sigs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.xxhash64(
                            *[
                                F.element_at("signature", b * rows_per_band + r + 1)
                                for r in range(rows_per_band)
                            ]
                        ).alias("band_hash"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "band.band_id", "band.band_hash")

    cand = (
        banded.alias("a")
        .join(
            banded.alias("b"),
            on=[
                F.col("a.band_id") == F.col("b.band_id"),
                F.col("a.band_hash") == F.col("b.band_hash"),
                F.col("a.doc_id") < F.col("b.doc_id"),
            ],
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])  # same pair can share >1 band
    )
    # verify candidates with exact Jaccard: shingle arrays join back in
    # (candidates ≪ corpus, so these joins move only the survivors)
    sh = documents.select("doc_id", shingles(F.col("text"), k).alias("sh"))
    cand = (
        cand.join(sh.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sh", "sh_a"), "doc_a")
        .join(sh.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sh", "sh_b"), "doc_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return (
        cand.select(
            "doc_a",
            "doc_b",
            det_round(ratio(inter, union), 4).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= jaccard_threshold)
    )


def simhash(documents: DataFrame, bits: int = 64) -> DataFrame:
    """64-bit SimHash over tokens: sign-sum of per-token xxhash64 bits.

    Pure JVM expression: for each bit position, count tokens whose hash
    has the bit set vs not; bit is 1 if the majority sets it. Emitted
    as the signed long whose two's-complement bits are the signature.
    """
    # exploded form for the same CollapseProject reason as MinHash: the
    # token-hash array would otherwise be re-evaluated once per bit.
    per_token = documents.select(
        "doc_id", F.explode(tokens(F.lower(F.col("text")))).alias("tok")
    ).select("doc_id", F.xxhash64("tok").alias("h"))
    ones = [
        F.sum(F.shiftrightunsigned("h", b).bitwiseAND(F.lit(1).cast("long"))).alias(
            f"ones_{b}"
        )
        for b in range(bits)
    ]
    agg = per_token.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"), *ones)
    sig = F.lit(0).cast("long")
    for b in range(bits):
        sig = sig.bitwiseOR(
            F.when(
                F.col(f"ones_{b}") * 2 >= F.col("n"),
                F.shiftleft(F.lit(1).cast("long"), b),
            ).otherwise(F.lit(0).cast("long"))
        )
    return agg.select("doc_id", sig.alias("simhash"))


def simhash_near_dups(documents: DataFrame, prefix_bits: int = 16) -> DataFrame:
    """Near-dup candidates = docs sharing the top ``prefix_bits`` of
    their SimHash — a hash-groupBy blocking scheme (no pairwise scan)."""
    sigs = simhash(documents)
    block = F.shiftrightunsigned("simhash", 64 - prefix_bits)
    blocks = sigs.select("doc_id", "simhash", block.alias("block"))
    a, b = blocks.alias("a"), blocks.alias("b")
    return a.join(
        b,
        on=[F.col("a.block") == F.col("b.block"), F.col("a.doc_id") < F.col("b.doc_id")],
    ).select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
        F.col("a.simhash").alias("simhash_a"),
        F.col("b.simhash").alias("simhash_b"),
    )


def ngram_jaccard_pairs(
    documents: DataFrame,
    k: int = 3,
    block_col: str = "lang",
    threshold: float = 0.1,
) -> DataFrame:
    """Exact k-shingle Jaccard for every doc pair within a block.

    The blocking column bounds the quadratic pair space; at 100 TB the
    block would be an LSH bucket (``minhash_lsh_candidates``), this is
    the exact baseline on modest blocks.
    """
    # Inverted-index formulation: explode distinct shingles to
    # (block, shingle, doc) postings, self-join on the shingle key, and
    # count shared shingles per pair — |A∩B| — then
    # jaccard = inter / (|A| + |B| − inter). Any threshold > 0 implies
    # intersection ≥ 1, so pairs that never co-occur in a posting list
    # (the overwhelming majority) are never materialized. Work is
    # Σ_shingle df² join tuples (measured 0.9M at sf0.1, max df 14)
    # instead of |pairs-per-block|² array intersections (2.5M pairs ×
    # ~200-element sets — the previous formulation, 3.5× slower). At
    # 100 TB the shuffle is on the shingle key (high cardinality, no
    # skew for k-word shingles); a stop-shingle df cap would bound the
    # worst case.
    sh = documents.select(
        "doc_id",
        F.col(block_col).alias("block"),
        shingles(F.col("text"), k).alias("sh"),
    )
    if threshold <= 0:
        # threshold 0 asks for *every* pair including zero-overlap ones,
        # which an inverted index by construction never emits — fall
        # back to materialized pairs with array intersection.
        a = sh.select(
            F.col("doc_id").alias("doc_a"), "block", F.col("sh").alias("sh_a")
        )
        b = sh.select(
            F.col("doc_id").alias("doc_b"),
            F.col("block").alias("block_b"),
            F.col("sh").alias("sh_b"),
        )
        paired = a.join(
            b,
            on=[F.col("block") == F.col("block_b"), F.col("doc_a") < F.col("doc_b")],
        )
        inter_sz = F.size(F.array_intersect("sh_a", "sh_b"))
        union_sz = F.size(F.array_union("sh_a", "sh_b"))
        return paired.select(
            "doc_a", "doc_b", det_round(ratio(inter_sz, union_sz), 4).alias("jaccard")
        )
    postings = sh.select(
        "doc_id", "block", F.size("sh").alias("n"), F.explode("sh").alias("s")
    )
    # SHUFFLE_HASH hint: without it Catalyst broadcasts the (small
    # by bytes) postings side and the Σdf² pair expansion runs inside
    # the map tasks of the *other* side — parallelism = input file
    # splits (1 at sf0.1), not cluster cores. A shuffle join keys both
    # sides on (block, shingle), spreading posting lists evenly.
    inter = (
        postings.alias("a").hint("shuffle_hash")
        .join(
            postings.alias("b"),
            on=[
                F.col("a.block") == F.col("b.block"),
                F.col("a.s") == F.col("b.s"),
                F.col("a.doc_id") < F.col("b.doc_id"),
            ],
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.n").alias("_n_a"),
            F.col("b.n").alias("_n_b"),
        )
        .agg(F.count(F.lit(1)).alias("_inter"))
    )
    union = F.col("_n_a") + F.col("_n_b") - F.col("_inter")
    return (
        inter.select(
            "doc_a",
            "doc_b",
            det_round(ratio(F.col("_inter"), union), 4).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def connected_components(
    pairs: DataFrame,
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
    max_iterations: int = 25,
) -> DataFrame:
    """Dedup cluster assignment: connected components over candidate
    pairs by iterative min-label propagation (the step near-dup
    pipelines need after pair generation — pairs alone don't say which
    copies form one group).

    Each iteration every node adopts the minimum label among itself and
    its neighbors; converges in O(component diameter) rounds — near-dup
    clusters are dense, so 2–4 rounds in practice. Each round is one
    join + one groupBy (all shuffles on node id); ``localCheckpoint``
    truncates the lineage so plan size stays constant. The driver-side
    loop is a convergence check, not data movement — this is the
    standard DataFrame-only CC (GraphX/GraphFrames' algorithm without
    the dependency).
    """
    fwd = pairs.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    )
    edges = fwd.union(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(max_iterations):
        neighbor_min = (
            edges.join(
                labels.select(
                    F.col("node").alias("dst"), F.col("label").alias("dst_label")
                ),
                "dst",
            )
            .groupBy("src")
            .agg(F.min("dst_label").alias("neighbor_label"))
        )
        updated = (
            labels.join(
                neighbor_min, labels["node"] == neighbor_min["src"], "left"
            )
            .select(
                "node",
                "label",
                F.least(
                    F.col("label"), F.coalesce("neighbor_label", F.col("label"))
                ).alias("new_label"),
            )
        )
        changed = updated.filter(F.col("new_label") < F.col("label")).count()
        labels = updated.select(
            "node", F.col("new_label").alias("label")
        ).localCheckpoint()
        if changed == 0:
            break
    sizes = labels.groupBy("label").agg(F.count(F.lit(1)).alias("component_size"))
    return labels.join(sizes, "label").select(
        F.col("node").alias("doc_id"),
        F.col("label").alias("component_id"),
        "component_size",
    )
