"""Steady-state cost of the round-12 streamed state tiers (the
quantile histogram and the BPE word-count/model gates): at ×N rows,
measure (1) the bulk load, (2) an incremental epoch of +10 %
arrivals — the steady state the manifests exist for — and (3) the
full-corpus batch recompute a refresh-per-session deployment would
pay at the same size. O(arrivals) vs O(corpus): the incremental
epoch's cost should be flat in N while (3) grows with it.

Usage: python scripts/bench_stream_tiers.py [factor] [sf_dir] [compound]
Pass ``compound`` as the third arg to rewrite the documents as
compound words (the bench_bpe_depth.py triple-concatenation, ~50k
types at ×10) — the synthetic corpus's 31-word vocabulary keeps the
BPE relearn scan trivially small, so the compound run is where the
refit-from-counts vs relearn-from-text gap is actually visible.
Prints one JSON line {"metric": "stream_tiers", ...}.
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
    compound = len(sys.argv) > 3 and sys.argv[3] == "compound"

    from pyspark.sql import functions as F

    from real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark import (
        get_spark,
    )
    from real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators.olap_deep import (
        price_quantiles,
        price_quantiles_from_histogram,
    )
    from real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators.text import (
        bpe_learn_merges,
    )
    from real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.sources.readers import (
        load_testdata,
    )
    from real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.streaming.pipeline import (
        read_price_histogram,
        run_corpus_ingest,
        run_price_histogram_ingest,
    )

    spark = get_spark("bench-stream-tiers")
    spark.sparkContext.setLogLevel("ERROR")

    tmp = tempfile.mkdtemp(prefix="stream_tiers_")
    out: dict[str, float | int] = {}
    tables = {}
    prefixes = ("bq_", "bb_")
    try:
        # ---- quantile tier over ×factor lineitem --------------------
        li = load_testdata(spark, sf_dir, ("lineitem",))["lineitem"]
        rows = li.select("l_linestatus", "l_extendedprice")
        parts = [rows for _ in range(factor)]
        bulk = parts[0]
        for p in parts[1:]:
            bulk = bulk.unionByName(p)
        n_bulk = bulk.count()
        out["quantile_rows_bulk"] = n_bulk

        q_raw = os.path.join(tmp, "q_raw")
        q_zone = os.path.join(tmp, "q_zone")
        q_ckpt = os.path.join(tmp, "q_ckpt")
        bulk.write.mode("overwrite").parquet(q_raw)
        t0 = time.perf_counter()
        tables = run_price_histogram_ingest(
            spark, q_raw, q_zone, q_ckpt, table_prefix=prefixes[0]
        )
        out["quantile_bulk_ingest_sec"] = round(time.perf_counter() - t0, 2)

        # +10 % arrivals: one incremental epoch (the steady state)
        rows.limit(int(n_bulk * 0.1 / factor) or 1).write.mode(
            "append"
        ).parquet(q_raw)
        t0 = time.perf_counter()
        run_price_histogram_ingest(
            spark, q_raw, q_zone, q_ckpt, table_prefix=prefixes[0]
        )
        out["quantile_incremental_epoch_sec"] = round(
            time.perf_counter() - t0, 2
        )

        # serve from the folded landed state
        t0 = time.perf_counter()
        price_quantiles_from_histogram(
            read_price_histogram(spark, tables["price_hist"], q_zone)
        ).collect()
        out["quantile_serve_from_state_sec"] = round(
            time.perf_counter() - t0, 2
        )

        # the alternative: full-corpus single-pass recompute
        t0 = time.perf_counter()
        price_quantiles(bulk).collect()
        out["quantile_batch_recompute_sec"] = round(
            time.perf_counter() - t0, 2
        )

        # ---- BPE tier over ×factor documents -------------------------
        docs = load_testdata(spark, sf_dir, ("documents",))["documents"]
        max_id = docs.agg(F.max("doc_id")).first()[0] + 1
        dparts = [
            docs.select(
                (F.col("doc_id") + F.lit(i * max_id)).alias("doc_id"),
                "text",
            )
            for i in range(factor)
        ]
        dbulk = dparts[0]
        for p in dparts[1:]:
            dbulk = dbulk.unionByName(p)
        if compound:
            # realistic vocabulary: consecutive token triples
            # concatenated, with a per-replica tag word so types grow
            # with the factor (the bench_cms_geometry derivation)
            tagged = [
                dparts[i].withColumn(
                    "text",
                    F.concat(F.col("text"), F.lit(f" copytag{i}"))
                    if i
                    else F.col("text"),
                )
                for i in range(factor)
            ]
            dbulk = tagged[0]
            for p in tagged[1:]:
                dbulk = dbulk.unionByName(p)
            arr = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
            n3 = (F.size(arr) / F.lit(3)).cast("int")
            dbulk = dbulk.filter(F.size(arr) >= 3).withColumn(
                "text",
                F.array_join(
                    F.transform(
                        F.sequence(F.lit(1), n3),
                        lambda j: F.concat_ws(
                            "", F.slice(arr, (j - F.lit(1)) * 3 + 1, 3)
                        ),
                    ),
                    " ",
                ),
            )
            dbulk.write.mode("overwrite").parquet(
                os.path.join(tmp, "b_compound")
            )
            dbulk = spark.read.parquet(os.path.join(tmp, "b_compound"))
            out["compound"] = 1
        out["bpe_docs_bulk"] = dbulk.count()

        b_raw = os.path.join(tmp, "b_raw")
        b_zone = os.path.join(tmp, "b_zone")
        b_ckpt = os.path.join(tmp, "b_ckpt")
        dbulk.write.mode("overwrite").parquet(b_raw)
        t0 = time.perf_counter()
        btables = run_corpus_ingest(
            spark, b_raw, b_zone, b_ckpt,
            state_refresh=True, learn_bpe=True,
            table_prefix=prefixes[1],
        )
        tables.update(btables)
        out["bpe_bulk_ingest_sec"] = round(time.perf_counter() - t0, 2)

        # +10 % arrivals: counts land + drift scoring, NO relearn
        docs.select(
            (F.col("doc_id") + F.lit(factor * max_id)).alias("doc_id"),
            "text",
        ).limit(int(out["bpe_docs_bulk"] * 0.1 / factor) or 1).write.mode(
            "append"
        ).parquet(b_raw)
        t0 = time.perf_counter()
        run_corpus_ingest(
            spark, b_raw, b_zone, b_ckpt,
            state_refresh=True, learn_bpe=True,
            table_prefix=prefixes[1],
        )
        out["bpe_incremental_epoch_sec"] = round(
            time.perf_counter() - t0, 2
        )

        # what the gate actually does on drift: re-learn from the
        # FOLDED COUNTS (|vocab| rows), zero text scans
        from real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators.text import (
            bpe_learn_merges_from_words,
        )
        from real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.streaming.pipeline import (
            read_bpe_word_counts,
        )

        t0 = time.perf_counter()
        bpe_learn_merges_from_words(
            read_bpe_word_counts(
                spark, btables["bpe_word_counts"], b_zone
            ),
            os.path.join(tmp, "b_refit"),
        ).collect()
        out["bpe_refit_from_counts_sec"] = round(
            time.perf_counter() - t0, 2
        )

        # the alternative: re-learn from raw text at full size
        t0 = time.perf_counter()
        bpe_learn_merges(dbulk, os.path.join(tmp, "b_batch")).collect()
        out["bpe_batch_relearn_sec"] = round(time.perf_counter() - t0, 2)

        print(
            json.dumps(
                {"metric": "stream_tiers", "factor": factor, **out}
            )
        )
    finally:
        for t in tables.values():
            spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
