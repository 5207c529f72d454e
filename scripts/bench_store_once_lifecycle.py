"""×N end-to-end IVFPQ-only store-once LIFECYCLE line (VERDICT r13 #7
stretch): the one composition the footprint/recall/gens scripts don't
measure together — ingest → drift refit → compaction → serve, with
wall-clock and on-disk bytes at each stage, on the ×N-inflated corpus.

Stages:
  1. bulk ingest (wave 1 = the ×N corpus; gen-0 fit + encode)
  2. drift epoch  (wave 2 = the corpus ×100 under offset ids; refit to
     gen 1, re-encoding retained-sample ∪ batch — generations accrete)
  3. compaction + vacuum (compact_model_zone retained_sample_mode
     drops the sample ids' superseded gen-0 encodes and folds epochs
     into a fresh directory; vacuum_manifest_zone then reaps the
     superseded one — bytes only drop after the reaper runs)
  4. serve        (ivfpq_topk_streamed multi-gen top-k, min-of-3 warm)
     measured BEFORE and AFTER compaction

Usage: python scripts/bench_store_once_lifecycle.py [factor] [sf_dir]
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


def _du(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

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
        vacuum_manifest_zone,
        read_ivfpq_codes,
        run_embedding_ingest,
    )

    spark = get_spark("bench-store-once-lifecycle")
    spark.sparkContext.setLogLevel("ERROR")

    tmp = tempfile.mkdtemp(prefix="store_once_lc_")
    out: dict = {"factor": factor, "sf_dir": sf_dir}
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
        big = parts[0]
        for p in parts[1:]:
            big = big.unionByName(p)
        big = big.select(
            "vec_id", F.col("embedding").cast("array<float>")
        )
        out["corpus_rows"] = factor * max_id
        queries = emb.filter(F.col("vec_id") < 10)

        raw = os.path.join(tmp, "raw")
        zone = os.path.join(tmp, "zone")
        ckpt = os.path.join(tmp, "ckpt")

        def ingest():
            return run_embedding_ingest(
                spark, raw, zone, ckpt,
                pq=False, ivfpq=True, ivf=False, n_buckets=8,
                table_prefix="solc_", store_flat_embeddings=False,
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

        # 1. bulk ingest
        big.write.mode("append").parquet(raw)
        t0 = time.perf_counter()
        tables = ingest()
        out["ingest_sec"] = round(time.perf_counter() - t0, 2)
        out["zone_bytes_gen0"] = _du(zone)

        # 2. drift epoch (×100 wave, fresh ids → refit to gen 1)
        drift = big.select(
            (F.col("vec_id") + F.lit(100_000_000)).alias("vec_id"),
            F.transform(
                "embedding", lambda x: (x * 100).cast("float")
            ).alias("embedding"),
        )
        drift.write.mode("append").parquet(raw)
        t0 = time.perf_counter()
        ingest()
        out["drift_epoch_sec"] = round(time.perf_counter() - t0, 2)
        meta = _read_model_meta(zone, IVFPQ_MODEL_DIR)
        assert meta["gen"] == 1, f"drift wave did not refit: {meta}"
        out["zone_bytes_post_drift"] = _du(zone)
        n_total = 2 * factor * max_id
        live = read_ivfpq_codes(
            spark, tables["ivfpq_codes"], zone, retained_sample_mode=True
        )
        assert live.select("vec_id").distinct().count() == n_total

        # 4a. multi-gen serve, pre-compaction
        out["serve_pre_compaction_sec"] = timed_serve()

        # 3. compaction + vacuum (compaction folds the kept rows into
        # a fresh directory and deliberately leaves the superseded one
        # for the retention-guarded reaper — bytes only drop after
        # vacuum, so the lifecycle runs both; min_age 0 is safe here
        # because the writer is provably stopped)
        t0 = time.perf_counter()
        compact_model_zone(
            spark, tables["ivfpq_codes"], zone, "ivfpq_codes",
            IVFPQ_MODEL_DIR, n_buckets=8,
            extra_partition_cols=("cluster_id",),
            retained_sample_mode=True,
        )
        out["compaction_sec"] = round(time.perf_counter() - t0, 2)
        out["zone_bytes_post_compaction_pre_vacuum"] = _du(zone)
        t0 = time.perf_counter()
        vacuum_manifest_zone(
            spark, tables["ivfpq_codes"], zone, "ivfpq_codes",
            min_age_seconds=0,
        )
        out["vacuum_sec"] = round(time.perf_counter() - t0, 2)
        out["zone_bytes_post_compaction"] = _du(zone)

        # 4b. multi-gen serve, post-compaction — same result set
        live2 = read_ivfpq_codes(
            spark, tables["ivfpq_codes"], zone, retained_sample_mode=True
        )
        assert live2.count() == live.count()
        out["serve_post_compaction_sec"] = timed_serve()

        # context: what the flat deployment's corpus bytes would be
        out["raw_corpus_bytes_2waves"] = _du(raw)
        out["zone_vs_raw"] = round(
            out["zone_bytes_post_compaction"]
            / out["raw_corpus_bytes_2waves"],
            4,
        )
    finally:
        for name in tables.values():
            spark.sql(f"DROP TABLE IF EXISTS {name}")
        shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
