"""Measure the refine tier: recall@10 lift of ADC-shortlist → exact
rerank over the plain compressed IVFPQ serve, at matched serving cost.

Protocol (the FAISS refine evaluation shape): fit the IVFPQ model ONCE
(landed-tables discipline — serves measure SERVING, not fitting), then
per configuration serve 50 queries and score recall@10 against the
brute-force baseline. Shortlist sweep shows the knob: s = k is "rerank
the ADC winners" (recall can only reorder), growing s buys back the
candidates quantization mis-ranked below the cut until recall
saturates at the probe ceiling (candidates outside the probed cells
are unreachable at any shortlist — that's n_probe's job).

A scale ``factor`` inflates the corpus ×N under offset ids with a
deterministic per-copy coordinate perturbation (copies are NEAR
neighbors, not cosine-identical clones — identical copies would make
every top-k a tie party), confirming off the toy corpus that the
|q|·shortlist broadcast and the flat-vector equi-join hold: rerank
cost must ride |q|·shortlist, never the corpus (VERDICT r14 #2).

``rerank_sample_s*`` measures the STORE-ONCE question (VERDICT r14
#3): the IVFPQ-only deployment retains flat vectors ONLY for the
~6.7% fit diet (vec_id % 29 == 0 or % 31 == 0), so the best rerank it
can run exact-scores just the shortlist candidates that happen to be
sample ids and keeps the ADC estimate for the rest. The measured
recall decides whether sample-rerank is worth offering or the
deployment rule stays "store-once = ADC-only serving; rerank requires
store_flat_embeddings=True".

``mmr`` mode (3rd arg) measures the DIVERSIFICATION stage instead
(VERDICT r15 #2): mmr_topk composes on the rerank shortlist, so its
cost model is |q|·s candidate rows + a |q|·s² pairwise table built
once + k sequential checkpointed greedy steps — plan-constant-
dominated, never corpus-sized. The mode runs the exact baseline, the
plain rerank serve it composes on, and MMR at λ=0.7/λ=1.0, reporting
the pairwise bound so the table-size claim is a recorded number.

``binary`` mode measures the 1-bit tier (r16): land thresholds +
packed codes once, then serve ``binary_topk`` across the shortlist
sweep — the Hamming stage scans 24 B/vector (two XOR+popcount per
pair) and the rerank equi-join touches |q|·s flat rows, so the serve
wall should grow like the codes scan while brute force grows like
the full vector scan; recall@10 against brute force records what the
sign bits keep at each shortlist.

Usage: python scripts/bench_rerank.py [sf_dir] [factor] [mode]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark import (  # noqa: E402
    get_spark,
)
from real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (  # noqa: E402
    similarity,
)


def topk_sets(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return out


def mean_recall(truth, approx):
    recalls = [
        len(truth[q] & approx.get(q, set())) / len(truth[q]) for q in truth
    ]
    return round(sum(recalls) / len(recalls), 4)


def _perturb(i: int):
    # i binds as _perturb's parameter (a loop-variable closure would
    # give every copy the last i); per-coordinate shift so copies are
    # near-dups in COSINE, not rescaled clones (cosine is
    # scale-invariant). NOTE: exactly 2 lambda params — F.transform
    # counts a default arg as a third and rejects it.
    shift = F.lit(0.002 * i)

    def fn(x, j):
        return (
            x + (shift * ((j % 7).cast("double") - F.lit(3.0))).cast("float")
        ).cast("float")

    return fn


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    mode = sys.argv[3] if len(sys.argv) > 3 else "all"
    k = 10
    spark = get_spark("bench-rerank")
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    if factor > 1:
        max_id = emb.agg(F.max("vec_id")).first()[0] + 1
        emb = emb.select("vec_id", "embedding")
        parts = [emb]
        for i in range(1, factor):
            parts.append(
                emb.select(
                    (F.col("vec_id") + F.lit(i * max_id)).alias("vec_id"),
                    F.transform("embedding", _perturb(i)).alias(
                        "embedding"
                    ),
                )
            )
        bulk = parts[0]
        for p in parts[1:]:
            bulk = bulk.unionByName(p)
        emb = bulk.cache()
    queries = emb.filter(F.col("vec_id") < 50)

    t0 = time.perf_counter()
    truth = topk_sets(similarity.brute_force_topk(emb, queries, k=k))
    brute_sec = round(time.perf_counter() - t0, 3)

    if mode == "binary":
        out = {
            "metric": "binary_ann_scale",
            "sf_dir": sf_dir,
            "factor": factor,
            "n_vectors": emb.count(),
            "k": k,
            "n_queries": 50,
            "brute_force_sec": brute_sec,
            "configs": [],
        }
        thr = similarity.binary_thresholds(emb).cache()
        bcodes = similarity.binary_encode(emb, thr).cache()
        thr.count(), bcodes.count()
        for shortlist in (k, 2 * k, 4 * k, 8 * k):
            t0 = time.perf_counter()
            bq = topk_sets(
                similarity.binary_topk(
                    emb, queries, k=k, shortlist=shortlist,
                    thresholds=thr, codes=bcodes,
                )
            )
            out["configs"].append({
                "serve": f"binary_s{shortlist}",
                "recall_at_10": mean_recall(truth, bq),
                "sec": round(time.perf_counter() - t0, 3),
            })
        # the composed IVF × binary serve: cells prune WHICH rows,
        # codes cheapen each surviving distance — recall now also
        # pays the probe ceiling (candidates outside probed cells
        # are unreachable), the read-fraction × byte-width trade
        for n_probe in (2, 4):
            t0 = time.perf_counter()
            comp = topk_sets(
                similarity.ivf_binary_topk(
                    emb, queries, k=k, shortlist=8 * k,
                    n_clusters=16, n_probe=n_probe,
                    thresholds=thr, codes=bcodes,
                )
            )
            out["configs"].append({
                "serve": f"ivfbinary_p{n_probe}_s{8 * k}",
                "recall_at_10": mean_recall(truth, comp),
                "sec": round(time.perf_counter() - t0, 3),
            })
        print(json.dumps(out))
        return

    # land the model once (cache + materialize), so every serve below
    # measures serving cost only — the production seam
    cent, cb, codes = similarity.ivfpq_model(emb)
    cent, cb, codes = cent.cache(), cb.cache(), codes.cache()
    cent.count(), cb.count(), codes.count()

    out = {
        "metric": "ivfpq_rerank_recall",
        "sf_dir": sf_dir,
        "factor": factor,
        "n_vectors": emb.count(),
        "k": k,
        "n_queries": 50,
        "brute_force_sec": brute_sec,
        "configs": [],
    }

    if mode == "mmr":
        out["metric"] = "mmr_scale"
        s = 8 * k
        out["shortlist"] = s
        out["pairwise_rows_bound"] = 50 * s * (s - 1)
        t0 = time.perf_counter()
        rer = topk_sets(
            similarity.ivfpq_rerank_topk(
                emb, queries, shortlist=s, k=k,
                centroids=cent, codebook=cb, codes=codes,
            )
        )
        out["configs"].append({
            "serve": f"rerank_s{s}",
            "recall_at_10": mean_recall(truth, rer),
            "sec": round(time.perf_counter() - t0, 3),
        })
        for lam in (0.7, 1.0):
            t0 = time.perf_counter()
            mmr = topk_sets(
                similarity.mmr_topk(
                    emb, queries, k=k, shortlist=s, lam=lam,
                    centroids=cent, codebook=cb, codes=codes,
                )
            )
            out["configs"].append({
                "serve": f"mmr_s{s}_lam{lam}",
                "recall_at_10": mean_recall(truth, mmr),
                "sec": round(time.perf_counter() - t0, 3),
            })
        # λ=1 must reduce to the plain rerank cut — assert it in the
        # harness so a scale record can never carry a broken compose
        assert mmr == rer, "mmr λ=1 diverged from rerank order"
        print(json.dumps(out))
        return

    t0 = time.perf_counter()
    adc = topk_sets(
        similarity.ivfpq_topk(
            emb, queries, k=k, centroids=cent, codebook=cb, codes=codes
        )
    )
    out["configs"].append(
        {
            "serve": "adc_only",
            "recall_at_10": mean_recall(truth, adc),
            "sec": round(time.perf_counter() - t0, 3),
        }
    )

    for shortlist in (k, 2 * k, 4 * k, 8 * k):
        t0 = time.perf_counter()
        rer = topk_sets(
            similarity.ivfpq_rerank_topk(
                emb, queries, shortlist=shortlist, k=k,
                centroids=cent, codebook=cb, codes=codes,
            )
        )
        out["configs"].append(
            {
                "serve": f"rerank_s{shortlist}",
                "recall_at_10": mean_recall(truth, rer),
                "sec": round(time.perf_counter() - t0, 3),
            }
        )

    # STORE-ONCE emulation: flat vectors exist ONLY for the retained
    # ~6.7% fit diet, so exact-score the shortlist candidates that are
    # sample ids and keep the ADC estimate for the rest (both estimate
    # the same cosine, so coalesce-then-rank is the honest best the
    # codes+sample corpus can serve)
    sample = emb.filter(
        (F.col("vec_id") % 29 == 0) | (F.col("vec_id") % 31 == 0)
    )
    qv = queries.select(
        F.col("vec_id").alias("query_id"),
        similarity.as_double("embedding").alias("qvec"),
    )
    for shortlist in (2 * k, 8 * k):
        t0 = time.perf_counter()
        short = similarity.ivfpq_topk(
            emb, queries, k=shortlist,
            centroids=cent, codebook=cb, codes=codes,
        ).select(
            "query_id", "neighbor_id",
            F.col("cosine_sim").alias("adc_sim"),
        )
        exact = (
            sample.select(
                F.col("vec_id").alias("neighbor_id"),
                similarity.as_double("embedding").alias("cvec"),
            )
            .join(F.broadcast(short.select("query_id", "neighbor_id")),
                  "neighbor_id")
            .join(F.broadcast(qv), "query_id")
            .select(
                "query_id", "neighbor_id",
                similarity.cosine(F.col("qvec"), F.col("cvec")).alias(
                    "exact_sim"
                ),
            )
        )
        from pyspark.sql import Window

        w = Window.partitionBy("query_id").orderBy(
            F.desc("_score"), F.asc("neighbor_id")
        )
        hybrid = (
            short.join(exact, ["query_id", "neighbor_id"], "left")
            .withColumn(
                "_score", F.coalesce("exact_sim", "adc_sim")
            )
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k)
        )
        out["configs"].append(
            {
                "serve": f"rerank_sample_s{shortlist}",
                "recall_at_10": mean_recall(truth, topk_sets(hybrid)),
                "sec": round(time.perf_counter() - t0, 3),
            }
        )

    # the probe ceiling: rerank EVERY candidate in the probed cells —
    # the best any shortlist can do without raising n_probe
    t0 = time.perf_counter()
    ceil = topk_sets(
        similarity.ivfpq_rerank_topk(
            emb, queries, shortlist=10_000_000, k=k,
            centroids=cent, codebook=cb, codes=codes,
        )
    )
    out["configs"].append(
        {
            "serve": "probe_ceiling",
            "recall_at_10": mean_recall(truth, ceil),
            "sec": round(time.perf_counter() - t0, 3),
        }
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
