"""Steady-state cost of the streaming ANN model gates (round 11): at
×N embeddings, measure (1) the first ingest epoch (gen-0 fit + full
encode), (2) an incremental epoch of +10 % arrivals (encode-only
against the landed model — the steady state), and (3) the
refit-from-scratch a session-scoped batch zone would pay on the same
grown corpus. The gap between (2) and (3) is the claim the gates
exist for: committed vectors are never re-encoded.

Usage: python scripts/bench_stream_ann.py [factor] [sf_dir]
Prints one JSON line {"metric": "stream_ann", ...}.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    from pyspark.sql import functions as F

    from real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark import (
        get_spark,
    )
    from real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators.similarity import (
        ivfpq_model,
        pq_codebook,
        pq_encode,
    )
    from real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.sources.readers import (
        load_testdata,
    )
    from real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.streaming.pipeline import (
        run_embedding_ingest,
    )

    spark = get_spark("bench-stream-ann")
    spark.sparkContext.setLogLevel("ERROR")

    tmp = tempfile.mkdtemp(prefix="stream_ann_")
    out: dict[str, float | int] = {}
    tables = {}
    try:
        emb = load_testdata(spark, sf_dir, ("embeddings",))["embeddings"]
        max_id = emb.agg(F.max("vec_id")).first()[0] + 1
        parts = [
            emb.select(
                (F.col("vec_id") + F.lit(i * max_id)).alias("vec_id"),
                "embedding",
            )
            for i in range(factor)
        ]
        base = parts[0]
        for p in parts[1:]:
            base = base.unionByName(p)
        base.repartition(32).write.mode("overwrite").parquet(
            f"{tmp}/base.parquet"
        )
        base = spark.read.parquet(f"{tmp}/base.parquet")
        n = base.count()  # warm
        out["corpus_vectors"] = n
        # +10% arrivals, shifted ids
        arrivals = base.filter(F.col("vec_id") % 10 == 0).select(
            (F.col("vec_id") + F.lit(factor * max_id)).alias("vec_id"),
            "embedding",
        )
        arrivals.write.mode("overwrite").parquet(f"{tmp}/arrivals.parquet")
        arrivals = spark.read.parquet(f"{tmp}/arrivals.parquet")
        out["arrival_vectors"] = arrivals.count()

        raw = os.path.join(tmp, "raw")
        zone = os.path.join(tmp, "zone")
        ckpt = os.path.join(tmp, "ckpt")
        prefix = "bsa_"
        base.write.mode("append").parquet(raw)
        t0 = time.perf_counter()
        tables = run_embedding_ingest(
            spark, raw, zone, ckpt,
            pq=True, ivfpq=True, ivf=True,
            n_buckets=8, table_prefix=prefix,
        )
        out["epoch0_fit_encode_sec"] = round(time.perf_counter() - t0, 3)

        arrivals.write.mode("append").parquet(raw)
        t0 = time.perf_counter()
        run_embedding_ingest(
            spark, raw, zone, ckpt,
            pq=True, ivfpq=True, ivf=True,
            n_buckets=8, table_prefix=prefix,
        )
        out["incremental_epoch_sec"] = round(time.perf_counter() - t0, 3)

        # the session-scoped alternative: refit + re-encode EVERYTHING
        # and land it, exactly what the batch model zones do (parquet
        # writes on both sides so the comparison is land-to-land)
        from real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators.ml import (
            kmeans_fixed,
        )
        from real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators.similarity import (
            as_double,
        )

        grown = base.unionByName(arrivals)
        bz = os.path.join(tmp, "batch_zone")
        t0 = time.perf_counter()
        cb = pq_codebook(grown)
        cb.write.mode("overwrite").parquet(f"{bz}/pq_codebook")
        pq_encode(
            grown, spark.read.parquet(f"{bz}/pq_codebook")
        ).write.mode("overwrite").parquet(f"{bz}/pq_codes")
        _c, _b, codes = ivfpq_model(grown)
        codes.write.mode("overwrite").parquet(f"{bz}/ivfpq_codes")
        kmeans_fixed(
            grown.select(
                "vec_id", as_double(F.col("embedding")).alias("embedding")
            ),
            k=16, iterations=2, dim=64,
            id_col="vec_id", vec_col="embedding",
            return_centroids=True,
        ).write.mode("overwrite").parquet(f"{bz}/ivf_centroids")
        out["batch_refit_sec"] = round(time.perf_counter() - t0, 3)
        print(json.dumps({"metric": "stream_ann", "factor": factor, **out}))
    finally:
        for t in tables.values():
            spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
