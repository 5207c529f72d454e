"""BPE merge-depth scale line (VERDICT r10 #7): run bpe_learn_merges
to PRODUCTION depth (default 2048 merges) under checkpoint_every=64
and record per-block wall-clock — the evidence that ms/merge stays
FLAT as the vocabulary state evolves through thousands of merges
(r10's BASELINE rows measured 64/256 merges; the 32k-merge claim
extrapolated from 256).

The synthetic corpus has only 31 distinct words, so the raw word-type
table exhausts after ~102 merges — far short of realistic-vocab
territory. The depth corpus therefore derives COMPOUND words from the
testdata deterministically: each consecutive token triple concatenates
into one word (~27k distinct types of ~13 chars at sf0.1, ~50k at
×10), giving a Heaps-realistic vocabulary with hundreds of thousands
of learnable merges while every byte still comes from the corpus.

Usage: python scripts/bench_bpe_depth.py [n_merges] [factor] [sf_dir]
Prints one JSON line {"metric": "bpe_depth", "blocks": [...], ...}.
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
    n_merges = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    checkpoint_every = 64

    from pyspark.sql import functions as F

    from real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark import (
        get_spark,
    )
    from real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        text,
    )
    from real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.sources.readers import (
        load_testdata,
    )

    spark = get_spark("bench-bpe-depth")
    spark.sparkContext.setLogLevel("ERROR")

    tmp = tempfile.mkdtemp(prefix="bpe_depth_")
    try:
        docs = load_testdata(spark, sf_dir, ("documents",))["documents"]
        max_id = docs.agg(F.max("doc_id")).first()[0] + 1
        parts = [
            docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * max_id))
            .withColumn(
                "text",
                F.concat(F.col("text"), F.lit(f" copytag{i}"))
                if i
                else F.col("text"),
            )
            for i in range(factor)
        ]
        all_docs = parts[0]
        for p in parts[1:]:
            all_docs = all_docs.unionByName(p)
        # compound-triple words: realistic vocab size (see module doc)
        arr = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
        n3 = (F.size(arr) / F.lit(3)).cast("int")
        compound = F.array_join(
            F.transform(
                F.sequence(F.lit(1), n3),
                lambda j: F.concat_ws(
                    "", F.slice(arr, (j - F.lit(1)) * 3 + 1, 3)
                ),
            ),
            " ",
        )
        all_docs = all_docs.filter(F.size(arr) >= 3).withColumn(
            "text", compound
        )
        all_docs.repartition(32).write.mode("overwrite").parquet(
            f"{tmp}/documents.parquet"
        )
        sdocs = spark.read.parquet(f"{tmp}/documents.parquet")
        n_docs = sdocs.count()  # also warms the JVM/footers

        blocks: list[dict] = []
        last_rank = 0

        def on_checkpoint(rank: int, seconds: float) -> None:
            nonlocal last_rank
            n = rank - last_rank
            blocks.append(
                {
                    "through_merge": rank,
                    "merges": n,
                    "sec": round(seconds, 3),
                    "ms_per_merge": round(1000.0 * seconds / max(n, 1), 1),
                }
            )
            last_rank = rank

        zdir = os.path.join(tmp, "bpe_zone")
        t0 = time.perf_counter()
        merges = text.bpe_learn_merges(
            sdocs,
            zdir,
            n_merges=n_merges,
            checkpoint_every=checkpoint_every,
            on_checkpoint=on_checkpoint,
        )
        n_learned = merges.count()
        total = round(time.perf_counter() - t0, 3)

        rates = [b["ms_per_merge"] for b in blocks]
        q = max(1, len(rates) // 4)
        summary = {
            "metric": "bpe_depth",
            "unit": "sec",
            "factor": factor,
            "documents_rows": n_docs,
            "n_merges": n_merges,
            "merges_learned": n_learned,
            "checkpoint_every": checkpoint_every,
            "total_sec": total,
            "ms_per_merge_overall": round(1000.0 * total / max(n_learned, 1), 1),
            "ms_per_merge_first_quartile": round(sum(rates[:q]) / q, 1),
            "ms_per_merge_last_quartile": round(sum(rates[-q:]) / q, 1),
            "blocks": blocks,
        }
        print(json.dumps(summary))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
