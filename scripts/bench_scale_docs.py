"""Scale-headroom bench for the TEXT tier: inflate the sf0.1 documents
corpus ~N× (shifted doc_ids; each copy gets one extra distinct token so
copies are LSH near-dups, not byte-exact dups) and run the LLM-pipeline
operators there. Complements bench_scale.py, which inflates only the
TPC-H facts — this is the harness that shows the dedup/fingerprint/
curation tier's work scales with real overlap, not corpus².

Usage: python scripts/bench_scale_docs.py [factor] [sf_dir]
Prints one JSON line {"metric": "scale_bench_docs", "factor": N, ...}.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCALE_DOC_QUERIES = [
    "dedup_exact",
    "dedup_minhash",
    "ngram_jaccard",
    "chunk_dedup_hashed",
    "winnowing_fingerprint",
    "corpus_curation",
    "quality_model",
    "token_count_bpe",
    "bm25_search",
    "incremental_dedup",
    "lm_perplexity",
    "lm_perplexity_bigram",
    "source_quota_sample",
    "dsir_selection",
    "ngram_novelty",
    "duplicate_span_removal",
    "curation_funnel",
    "curriculum_pack",
]
# text_semantic_neardup (8-plane single-table) and the r=12-pinned
# semantic_neardup_scaled gate are deliberately NOT in the default
# list: fixed-r blocking saturates once the corpus outgrows 2^r
# buckets (measured at factor 30: 912.7 s and 705–862 s respectively,
# vs ~185 s for the corpus-sized r=log2(n) run below — BASELINE.md);
# re-add manually to reproduce the saturation numbers.


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    from pyspark.sql import functions as F

    from real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark import (
        get_spark,
    )
    from real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.queries import (
        QUERIES,
    )
    from real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.sources.readers import (
        load_testdata,
    )

    spark = get_spark("bench-scale-docs")
    spark.sparkContext.setLogLevel("ERROR")

    tmp = tempfile.mkdtemp(prefix="spark_graft_scale_docs_")
    try:
        docs = load_testdata(spark, sf_dir, ("documents",))["documents"]
        max_id = docs.agg(F.max("doc_id")).first()[0] + 1
        parts = [
            docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * max_id))
            # one extra distinct token per copy: copies are near-dups
            # (high-Jaccard pairs for LSH to find), not byte-exact ones
            .withColumn(
                "text",
                F.concat(F.col("text"), F.lit(f" copytag{i}")) if i else F.col("text"),
            )
            for i in range(factor)
        ]
        all_docs = parts[0]
        for p in parts[1:]:
            all_docs = all_docs.unionByName(p)
        all_docs.repartition(32).write.mode("overwrite").parquet(
            f"{tmp}/documents.parquet"
        )
        n_docs = spark.read.parquet(f"{tmp}/documents.parquet").count()

        # warm (codegen + python workers) without touching a headline plan
        spark.read.parquet(f"{tmp}/documents.parquet").count()
        timings: dict[str, float] = {}
        for name in SCALE_DOC_QUERIES:
            t0 = time.perf_counter()
            QUERIES[name](spark, tmp).write.mode("overwrite").format("noop").save()
            timings[name] = round(time.perf_counter() - t0, 3)
        # interleaved min-of-2 for the LONG entries (ROADMAP r7 #1):
        # >60 s runs show a ±10 % AQE/GC-phase band, so a single sample
        # can't distinguish a regression from noise. The re-run pass is
        # interleaved (full sweep order, not back-to-back repeats) so
        # both samples of a query land in different GC phases; min is
        # the steady-state estimator, same as bench.py.
        slow = [n for n in SCALE_DOC_QUERIES if timings[n] > 60.0]
        for name in slow:
            t0 = time.perf_counter()
            QUERIES[name](spark, tmp).write.mode("overwrite").format("noop").save()
            timings[name] = min(
                timings[name], round(time.perf_counter() - t0, 3)
            )

        # corpus-sized blocking: r ≈ log2(n) planes (the registered
        # query pins r=12 for its sf0.01 oracle; at 150k docs the
        # right r is 16-17) — measures the sizing rule the operator
        # docstring prescribes
        import math as _math

        from real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
            similarity as _sim,
            text as _text,
        )

        r = min(24, int(_math.ceil(_math.log2(max(n_docs, 2)))))

        def _run_sized():
            _sim.embedding_near_dups_multitable(
                _text.feature_hash_vectors(
                    spark.read.parquet(f"{tmp}/documents.parquet"), dim=64
                ),
                threshold=0.8,
                dim=64,
                n_planes=r,
                n_tables=2,
                id_col="doc_id",
                vec_col="feature_vec",
            ).write.mode("overwrite").format("noop").save()

        t0 = time.perf_counter()
        _run_sized()
        timings[f"semantic_neardup_r{r}"] = round(time.perf_counter() - t0, 3)

        # materialize-vectors seam (VERDICT r6 #1) + self-sizing r
        # (r6 #4): vectors land in a zone table ONCE, the AND-OR
        # blocking + verify compose from the narrow parquet, and r
        # derives inside the operator from the zone count. The delta
        # vs the plan-pure line above is exactly the cost of the ~6
        # redundant tokenize->hash corpus derivations the seam removes.
        def _run_materialized():
            zvecs = _text.materialize_feature_hash_vectors(
                spark.read.parquet(f"{tmp}/documents.parquet"),
                f"{tmp}/fh_vectors_zone",
                dim=64,
            )
            _sim.embedding_near_dups_multitable(
                zvecs,
                threshold=0.8,
                dim=64,
                n_planes=None,
                n_tables=2,
                id_col="doc_id",
                vec_col="feature_vec",
            ).write.mode("overwrite").format("noop").save()

        t0 = time.perf_counter()
        _run_materialized()
        timings["semantic_neardup_auto_materialized"] = round(
            time.perf_counter() - t0, 3
        )

        # single-scan multi-state refresh (VERDICT r7 #1): one corpus
        # scan lands the token-event grain + feature/vector states;
        # compare against SCALE_DOC_QUERIES' independent derivations
        from real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
            corpus_state as _cs,
        )

        t0 = time.perf_counter()
        _cs.refresh_corpus_state(
            spark.read.parquet(f"{tmp}/documents.parquet"),
            f"{tmp}/corpus_state_zone",
            n_buckets=4096,
            dim=64,
        )
        timings["corpus_state_refresh"] = round(time.perf_counter() - t0, 3)

        # state-seam tier (VERDICT r9 #8): the cluster trio's FIRST
        # call pays the shared zone build (grain + k-means fit, keyed
        # on the tmp corpus signature); the two after it — and a warm
        # repeat of the first — are pure zone serves and must stay
        # ~flat vs the corpus-scan growth above.
        for name in (
            "lm_perplexity_bigram_state",      # self-contained rebuild
            "cluster_balanced_sample_state",   # cold: zone build + serve
            "cluster_top_terms_state",         # warm serve
            "kmeans_fit_report_state",         # warm serve
        ):
            t0 = time.perf_counter()
            QUERIES[name](spark, tmp).write.mode("overwrite").format(
                "noop"
            ).save()
            timings[name] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        QUERIES["cluster_balanced_sample_state"](spark, tmp).write.mode(
            "overwrite"
        ).format("noop").save()
        timings["cluster_balanced_sample_state_warm"] = round(
            time.perf_counter() - t0, 3
        )

        # ANN quantizer tier: inflate embeddings the same way
        # (shifted ids, identical vectors — timing, not recall) and
        # measure refit-per-run vs the landed model (VERDICT r9 #2/#8)
        emb = load_testdata(spark, sf_dir, ("embeddings",))["embeddings"]
        emb_max = emb.agg(F.max("vec_id")).first()[0] + 1
        eparts = [
            emb.withColumn("vec_id", F.col("vec_id") + F.lit(i * emb_max))
            for i in range(factor)
        ]
        all_emb = eparts[0]
        for p in eparts[1:]:
            all_emb = all_emb.unionByName(p)
        all_emb.repartition(32).write.mode("overwrite").parquet(
            f"{tmp}/embeddings.parquet"
        )
        for name in (
            "ann_ivf_topk",            # strided quantizer baseline
            "ann_ivf_trained",         # refit per run
            "ann_ivf_trained_state",   # cold: model-zone build + probe
        ):
            t0 = time.perf_counter()
            QUERIES[name](spark, tmp).write.mode("overwrite").format(
                "noop"
            ).save()
            timings[name] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        QUERIES["ann_ivf_trained_state"](spark, tmp).write.mode(
            "overwrite"
        ).format("noop").save()
        timings["ann_ivf_trained_state_warm"] = round(
            time.perf_counter() - t0, 3
        )

        # BPE at depth (ROADMAP r10->11 #2): the checkpoint_every
        # re-land discipline vs the unbounded replace chain at equal
        # merges, plus one production-depth line. The unbounded form's
        # cost is plan ANALYSIS (a 64-deep chained projection), not
        # data - exactly the pre-checkpoint PageRank failure shape.
        import tempfile as _tf

        from real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
            text as _text2,
        )

        sdocs = spark.read.parquet(f"{tmp}/documents.parquet")
        for label, n_m, ck in (
            ("bpe_merges_64_unchained", 64, 10_000),
            ("bpe_merges_64_ck16", 64, 16),
            ("bpe_merges_256_ck64", 256, 64),
        ):
            zdir = _tf.mkdtemp(prefix="scale_bpe_")
            try:
                t0 = time.perf_counter()
                _text2.bpe_learn_merges(
                    sdocs, zdir, n_merges=n_m, checkpoint_every=ck
                ).write.mode("overwrite").format("noop").save()
                timings[label] = round(time.perf_counter() - t0, 3)
            finally:
                shutil.rmtree(zdir, ignore_errors=True)

        # interleaved second sample for the long semantic pair too
        specials = [
            (f"semantic_neardup_r{r}", _run_sized),
            ("semantic_neardup_auto_materialized", _run_materialized),
        ]
        for sname, thunk in specials:
            if timings[sname] > 60.0:
                t0 = time.perf_counter()
                thunk()
                timings[sname] = min(
                    timings[sname], round(time.perf_counter() - t0, 3)
                )

        print(
            json.dumps(
                {
                    "metric": "scale_bench_docs",
                    "factor": factor,
                    "documents_rows": n_docs,
                    "value": round(sum(timings.values()), 3),
                    "unit": "sec",
                    "queries": timings,
                }
            )
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
