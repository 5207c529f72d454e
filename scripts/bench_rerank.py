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

Usage: python scripts/bench_rerank.py [sf_dir]
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


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    k = 10
    spark = get_spark("bench-rerank")
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 50)

    t0 = time.perf_counter()
    truth = topk_sets(similarity.brute_force_topk(emb, queries, k=k))
    brute_sec = round(time.perf_counter() - t0, 3)

    # land the model once (cache + materialize), so every serve below
    # measures serving cost only — the production seam
    cent, cb, codes = similarity.ivfpq_model(emb)
    cent, cb, codes = cent.cache(), cb.cache(), codes.cache()
    cent.count(), cb.count(), codes.count()

    out = {
        "metric": "ivfpq_rerank_recall",
        "sf_dir": sf_dir,
        "k": k,
        "n_queries": 50,
        "brute_force_sec": brute_sec,
        "configs": [],
    }

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
