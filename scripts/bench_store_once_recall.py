"""Recall cost of generation accretion in the IVFPQ-only store-once
deployment (r13): after a drift refit, the store-once zone serves old
non-sample vectors from their FROZEN gen-0 codes under the gen-0 model,
while the flat twin re-encoded everything under gen 1 — does serving
stale encodes cost recall?

Protocol: two waves (the corpus, then the corpus ×100-scaled under
offset ids — the drift forcer) through BOTH deployments; queries are
corpus vectors; ground truth is brute-force cosine top-k over the
union corpus. Reported: recall@k of (a) the store-once multi-gen serve,
(b) the flat twin's single-gen serve from its full gen-1 re-encode, and
(c) the pre-drift single-generation serve as the baseline.

Usage: python scripts/bench_store_once_recall.py [sf_dir] [k]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    from pyspark.sql import functions as F

    from real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark import (
        get_spark,
    )
    from real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators.similarity import (
        brute_force_topk,
        ivfpq_topk,
    )
    from real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.sources.readers import (
        load_testdata,
    )
    from real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.streaming.pipeline import (
        ivfpq_topk_streamed,
        read_ivfpq_codes,
        read_ivfpq_model,
        run_embedding_ingest,
    )

    spark = get_spark("bench-store-once-recall")
    spark.sparkContext.setLogLevel("ERROR")

    tmp = tempfile.mkdtemp(prefix="store_once_recall_")
    tabs: dict[str, dict[str, str]] = {}
    out: dict = {"sf_dir": sf_dir, "k": k}

    def recall(approx, exact) -> float:
        a: dict[int, set[int]] = {}
        for r in approx.collect():
            a.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        hits = tot = 0
        for r in exact.collect():
            tot += 1
            hits += r["neighbor_id"] in a.get(r["query_id"], set())
        return round(hits / tot, 4)

    try:
        emb = load_testdata(spark, sf_dir, ("embeddings",))[
            "embeddings"
        ].select("vec_id", "embedding")
        drift = emb.select(
            (F.col("vec_id") + F.lit(1_000_000)).alias("vec_id"),
            F.transform(
                "embedding", lambda x: (x * 100).cast("float")
            ).alias("embedding"),
        )
        queries = emb.filter(F.col("vec_id") < 20)
        union = emb.unionByName(drift)

        def ingest(mode: str, flat: bool):
            return run_embedding_ingest(
                spark,
                os.path.join(tmp, "raw"),
                os.path.join(tmp, f"zone_{mode}"),
                os.path.join(tmp, f"ckpt_{mode}"),
                pq=False, ivfpq=True, ivf=False, n_buckets=8,
                table_prefix=f"rc_{mode}_",
                store_flat_embeddings=flat,
            )

        # wave 1: both deployments at gen 0
        emb.write.mode("append").parquet(os.path.join(tmp, "raw"))
        for mode, flat in (("flat", True), ("once", False)):
            tabs[mode] = ingest(mode, flat)

        exact_pre = brute_force_topk(emb, queries, k=k)
        out["recall_pre_drift_once"] = recall(
            ivfpq_topk_streamed(
                spark, tabs["once"]["ivfpq_codes"],
                os.path.join(tmp, "zone_once"), queries, k=k,
            ),
            exact_pre,
        )

        # wave 2: the drift forcer — flat re-encodes everything at
        # gen 1; store-once freezes old non-sample codes at gen 0
        drift.write.mode("append").parquet(os.path.join(tmp, "raw"))
        for mode, flat in (("flat", True), ("once", False)):
            ingest(mode, flat)

        exact = brute_force_topk(union, queries, k=k)
        zf = os.path.join(tmp, "zone_flat")
        cent, cb = read_ivfpq_model(spark, zf)
        out["recall_post_drift_flat"] = recall(
            ivfpq_topk(
                union, queries, k=k, centroids=cent, codebook=cb,
                codes=read_ivfpq_codes(
                    spark, tabs["flat"]["ivfpq_codes"], zf
                ),
            ),
            exact,
        )
        out["recall_post_drift_once_multigen"] = recall(
            ivfpq_topk_streamed(
                spark, tabs["once"]["ivfpq_codes"],
                os.path.join(tmp, "zone_once"), queries, k=k,
            ),
            exact,
        )
        print(json.dumps({"metric": "store_once_recall", **out}))
    finally:
        for t in tabs.values():
            for name in t.values():
                spark.sql(f"DROP TABLE IF EXISTS {name}")
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
