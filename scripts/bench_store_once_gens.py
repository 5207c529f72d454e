"""Store-once serving cost vs LIVE GENERATION COUNT (VERDICT r13 #2's
measure-before-building): ``ivfpq_topk_streamed`` recomputes the
query-side probe/LUT chain per live generation, and compaction
normally keeps the generation count small — this script suppresses
compaction and drives the IVFPQ-only store-once zone through G drift
refits (each wave is the corpus under fresh offset ids, scaled ×3^g
so the distortion gate fires every wave), timing the multi-generation
serve after each, so the per-generation constant is measured instead
of guessed.

What grows per generation at this (local, small-data) scale is the
PLAN, not the data: one more probe window + two more broadcast LUT
joins + one more union branch of whole-stage codegen. At 100 TB the
per-gen scan bytes (Σ_g probed cells of gen g) dominate instead and
are already the minimum any correct multi-model serve must read — so
the decision rule recorded in BASELINE.md keys off the measured
per-gen CONSTANT here.

Usage: python scripts/bench_store_once_gens.py [factor] [gens] [sf_dir]
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
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    gens = int(sys.argv[2]) if len(sys.argv) > 2 else 7
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    # wave g arrives at scale 3^g: ×3 is far above the ×2 distortion
    # gate (|3x − c|² ≫ fit-time quantization error for unit-norm x)
    # while keeping the drift gate's DECIMAL(28,12) distortion SUM
    # well under its 10^16 integer cap — ×10^g saturated it at wave 6
    # (sum ≈ rows·4·(10^g·resid)²), which silently nulls bm and stops
    # refits
    assert gens <= 10, "wave scaling overflows decimal sums past 10 gens"

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
        ivfpq_topk_streamed,
        run_embedding_ingest,
    )

    spark = get_spark("bench-store-once-gens")
    spark.sparkContext.setLogLevel("ERROR")

    tmp = tempfile.mkdtemp(prefix="store_once_gens_")
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
        n_corpus = factor * max_id
        out["corpus_rows_per_wave"] = n_corpus
        queries = emb.filter(F.col("vec_id") < 10)

        raw = os.path.join(tmp, "raw")
        zone = os.path.join(tmp, "zone")
        ckpt = os.path.join(tmp, "ckpt")

        def serve():
            return ivfpq_topk_streamed(
                spark, tables["ivfpq_codes"], zone, queries, k=5
            )

        def timed(reps=3):
            cold = best = None
            for i in range(reps):
                t0 = time.perf_counter()
                serve().write.mode("overwrite").format("noop").save()
                dt = time.perf_counter() - t0
                cold = dt if i == 0 else cold
                best = dt if best is None else min(best, dt)
            return round(cold, 3), round(best, 3)

        def scaler(s):
            # NOTE: a 2-arg lambda would bind F.transform's
            # (element, index) signature — keep the closure 1-arg
            return lambda x: (x * s).cast("float")

        serve_by_gens: dict[int, dict] = {}
        for g in range(gens):
            wave = big.select(
                (F.col("vec_id") + F.lit(g * 100_000_000)).alias(
                    "vec_id"
                ),
                F.transform("embedding", scaler(3.0 ** g)).alias(
                    "embedding"
                ),
            )
            wave.write.mode("append").parquet(raw)
            tables = run_embedding_ingest(
                spark, raw, zone, ckpt,
                pq=False, ivfpq=True, ivf=False, n_buckets=8,
                table_prefix="sog_", store_flat_embeddings=False,
            )
            meta = _read_model_meta(zone, IVFPQ_MODEL_DIR)
            n_live = meta["gen"] + 1
            assert n_live == g + 1, (
                f"wave {g} did not refit: gen={meta['gen']} — the "
                "×3 forcer failed, numbers below would be bogus"
            )
            cold, warm = timed()
            serve_by_gens[n_live] = {"cold": cold, "warm": warm}
        out["serve_by_live_gens"] = serve_by_gens
        warms = [v["warm"] for _, v in sorted(serve_by_gens.items())]
        # least-squares slope of warm serve vs generation count — the
        # measured per-generation constant
        n = len(warms)
        xs = list(range(1, n + 1))
        mx, my = sum(xs) / n, sum(warms) / n
        slope = sum(
            (x - mx) * (y - my) for x, y in zip(xs, warms)
        ) / sum((x - mx) ** 2 for x in xs)
        out["per_gen_warm_slope_sec"] = round(slope, 3)
        out["warm_1gen_sec"] = warms[0]
        out[f"warm_{n}gen_sec"] = warms[-1]
    finally:
        for name in tables.values():
            spark.sql(f"DROP TABLE IF EXISTS {name}")
        shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
