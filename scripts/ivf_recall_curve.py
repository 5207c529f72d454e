"""Measure the IVF-Flat recall@10 vs n_probe trade-off (ROADMAP #5) and
confirm plan/codegen cost is flat in n_clusters now that centroids are
data, not an inlined literal expression tree.

Usage: python scripts/ivf_recall_curve.py [sf_dir]

Prints one JSON line:
  {"sf": ..., "n_clusters": ..., "curve": [{"n_probe": p,
   "recall_at_10": r, "sec": t}...], "codegen_check": {...}}
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


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("ivf-curve")
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 50)

    truth = topk_sets(similarity.brute_force_topk(emb, queries, k=10))

    n_clusters = 64
    curve = []
    for n_probe in (1, 2, 4, 8, 16, 32, 64):
        t0 = time.perf_counter()
        approx = topk_sets(
            similarity.ivf_topk(
                emb, queries, n_clusters=n_clusters, n_probe=n_probe, k=10,
                stride=7,
            )
        )
        sec = round(time.perf_counter() - t0, 3)
        recalls = [
            len(truth[q] & approx.get(q, set())) / len(truth[q]) for q in truth
        ]
        curve.append(
            {
                "n_probe": n_probe,
                "recall_at_10": round(sum(recalls) / len(recalls), 4),
                "sec": sec,
            }
        )

    # trained vs strided quantizer at n_clusters=256 (VERDICT r3 #9):
    # same plan shape, centroids from kmeans_centroids instead of the
    # strided sample — recall@10 at matched n_probe
    trained = similarity.kmeans_centroids(
        emb, n_clusters=256, max_iterations=5, stride=7
    ).cache()
    trained.count()
    quantizers = []
    for n_probe in (4, 16, 64):
        row = {"n_probe": n_probe}
        for label, cent in (("strided", None), ("kmeans", trained)):
            t0 = time.perf_counter()
            approx = topk_sets(
                similarity.ivf_topk(
                    emb, queries, n_clusters=256, n_probe=n_probe, k=10,
                    stride=7, centroids=cent,
                )
            )
            sec = round(time.perf_counter() - t0, 3)
            recalls = [
                len(truth[q] & approx.get(q, set())) / len(truth[q])
                for q in truth
            ]
            row[f"recall_{label}"] = round(sum(recalls) / len(recalls), 4)
            row[f"sec_{label}"] = sec
        quantizers.append(row)

    # codegen check: n_clusters=256 must not blow up analysis/codegen.
    # With centroids as data the plan is constant-size; assignment WORK
    # grows linearly in n_clusters (corpus x centroids cosines), so the
    # pass criterion is sub-linear wall-time growth (16x clusters ->
    # well under 16x time), not flat time.
    codegen = {}
    for nc, stride in ((16, 29), (256, 7)):
        t0 = time.perf_counter()
        similarity.ivf_topk(
            emb, queries, n_clusters=nc, n_probe=4, k=10, stride=stride
        ).write.mode("overwrite").format("noop").save()
        codegen[f"n_clusters_{nc}_sec"] = round(time.perf_counter() - t0, 3)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "sf": sf,
                "n_clusters": n_clusters,
                "curve": curve,
                "quantizer_256": quantizers,
                "codegen_check": codegen,
            }
        )
    )


if __name__ == "__main__":
    main()
