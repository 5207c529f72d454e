"""Store-once serve cost vs EPOCH COUNT (ROADMAP r15 #2): the ×30
lifecycle line showed serve flat pre/post compaction at LOW epoch
counts — this measures where the reader's per-epoch cost shows up.
N same-distribution waves land as N encode-only epochs at gen 0 (no
drift, so the generation count stays 1 and the variable is purely the
epoch layout); the multi-generation serve is timed at several epoch
counts, then the zone is compacted + vacuumed to ONE epoch and timed
again on the identical row set.

At 100 TB the per-epoch cost is a driver-side file listing plus
row-group dilution (many small epochs = many small parquet files per
cluster_id cell until compaction folds them) — exactly what this
curve prices.

Usage: python scripts/bench_store_once_epochs.py [epochs] [factor] [sf_dir]
Prints one JSON line.
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
    n_epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    checkpoints = sorted({1, 5, 10, 15, n_epochs} - {0})
    checkpoints = [c for c in checkpoints if c <= n_epochs]

    from pyspark.sql import functions as F

    from real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark import (
        get_spark,
    )
    from real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.sources.readers import (
        load_testdata,
    )
    from real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.streaming.pipeline import (
        IVFPQ_MODEL_DIR,
        _read_model_meta,
        compact_model_zone,
        ivfpq_topk_streamed,
        run_embedding_ingest,
        vacuum_manifest_zone,
    )

    spark = get_spark("bench-store-once-epochs")
    spark.sparkContext.setLogLevel("ERROR")

    tmp = tempfile.mkdtemp(prefix="store_once_ep_")
    out: dict = {"factor": factor, "sf_dir": sf_dir, "epochs": n_epochs}
    tables: dict[str, str] = {}
    try:
        emb = load_testdata(spark, sf_dir, ("embeddings",))[
            "embeddings"
        ].select("vec_id", "embedding")
        max_id = emb.agg(F.max("vec_id")).first()[0] + 1
        parts = [
            emb.select(
                (F.col("vec_id") + F.lit(i * max_id)).alias("vec_id"),
                "embedding",
            )
            for i in range(factor)
        ]
        wave0 = parts[0]
        for p in parts[1:]:
            wave0 = wave0.unionByName(p)
        wave0 = wave0.select(
            "vec_id", F.col("embedding").cast("array<float>")
        )
        rows_per_wave = factor * max_id
        out["rows_per_wave"] = rows_per_wave
        queries = emb.filter(F.col("vec_id") < 10)

        raw = os.path.join(tmp, "raw")
        zone = os.path.join(tmp, "zone")
        ckpt = os.path.join(tmp, "ckpt")

        def ingest():
            return run_embedding_ingest(
                spark, raw, zone, ckpt,
                pq=False, ivfpq=True, ivf=False, n_buckets=8,
                table_prefix="soe_", store_flat_embeddings=False,
            )

        def timed_serve(reps=3):
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                ivfpq_topk_streamed(
                    spark, tables["ivfpq_codes"], zone, queries, k=5
                ).write.mode("overwrite").format("noop").save()
                best = min(best, time.perf_counter() - t0)
            return round(best, 3)

        serve_by_epochs: dict[int, float] = {}
        for e in range(n_epochs):
            # same-distribution wave under fresh ids: encode-only
            # epoch against the frozen gen-0 model, no refit
            wave = wave0.select(
                (F.col("vec_id") + F.lit(e * 10_000_000)).alias(
                    "vec_id"
                ),
                "embedding",
            )
            wave.write.mode("append").parquet(raw)
            tables = ingest()
            if e + 1 in checkpoints:
                serve_by_epochs[e + 1] = timed_serve()
        meta = _read_model_meta(zone, IVFPQ_MODEL_DIR)
        assert meta["gen"] == 0, (
            f"same-distribution waves must not refit: {meta}"
        )
        out["serve_by_epochs"] = serve_by_epochs

        # fold to one epoch on the identical row set, reap, re-time
        t0 = time.perf_counter()
        compact_model_zone(
            spark, tables["ivfpq_codes"], zone, "ivfpq_codes",
            IVFPQ_MODEL_DIR, n_buckets=8,
            extra_partition_cols=("cluster_id",),
            retained_sample_mode=True,
        )
        vacuum_manifest_zone(
            spark, tables["ivfpq_codes"], zone, "ivfpq_codes",
            min_age_seconds=0,
        )
        out["compact_plus_vacuum_sec"] = round(
            time.perf_counter() - t0, 2
        )
        out["serve_compacted_1_epoch"] = timed_serve()
        out["corpus_rows_final"] = n_epochs * rows_per_wave
    finally:
        for name in tables.values():
            spark.sql(f"DROP TABLE IF EXISTS {name}")
        shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
