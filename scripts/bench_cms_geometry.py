"""Count-Min sketch at production geometry (VERDICT r10 #8): the
registered query's 1024×4 sketch and its ε=2/width bound are
demo-scale — this harness measures the OVERCOUNT DISTRIBUTION across
the ENTIRE vocabulary at width 2¹⁶ (and the toy 2¹⁰ for contrast) on
a realistically-sized vocabulary.

The synthetic corpus has 31 distinct words, which would leave a
2¹⁶-cell sketch collision-free and the measurement vacuous; the
harness therefore derives COMPOUND words from the corpus (consecutive
token triples concatenated — the bench_bpe_depth.py vocabulary
construction) giving ~50k/being ~90k types at ×10/×30, i.e. load
factors where hash collisions actually occur and the CM guarantee
(estimate ≥ truth; overcount ≤ ⌈e·N/w⌉ with prob ≥ 1-(1/e)^d) is
exercised, not just asserted.

Usage: python scripts/bench_cms_geometry.py [factor] [sf_dir]
Prints one JSON line {"metric": "cms_geometry", "sketches": [...]}.
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    depth = 4

    from pyspark.sql import functions as F

    from real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark import (
        get_spark,
    )
    from real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.functions.core import (
        md5_long,
    )
    from real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        text,
    )
    from real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.sources.readers import (
        load_testdata,
    )

    spark = get_spark("bench-cms-geometry")
    spark.sparkContext.setLogLevel("ERROR")

    tmp = tempfile.mkdtemp(prefix="cms_geom_")
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
        all_docs.filter(F.size(arr) >= 3).withColumn(
            "text", compound
        ).repartition(32).write.mode("overwrite").parquet(
            f"{tmp}/documents.parquet"
        )
        sdocs = spark.read.parquet(f"{tmp}/documents.parquet")
        n_docs = sdocs.count()  # warm

        exact = (
            sdocs.select(
                F.explode(text.tokens(F.lower(F.col("text")))).alias("term")
            )
            .groupBy("term")
            .agg(F.count(F.lit(1)).cast("long").alias("n_true"))
        )
        exact.write.mode("overwrite").parquet(f"{tmp}/exact.parquet")
        exact = spark.read.parquet(f"{tmp}/exact.parquet")
        stats = exact.agg(
            F.count(F.lit(1)).alias("vocab"),
            F.sum("n_true").alias("total"),
        ).first()
        vocab, total = int(stats["vocab"]), int(stats["total"])

        sketches = []
        for width in (1 << 10, 1 << 16):
            t0 = time.perf_counter()
            cells = text.cms_cells_from_term_counts(
                exact, width=width, depth=depth
            )
            cells.write.mode("overwrite").parquet(
                f"{tmp}/cells_{width}.parquet"
            )
            build_sec = round(time.perf_counter() - t0, 3)
            cells = spark.read.parquet(f"{tmp}/cells_{width}.parquet")

            # estimate EVERY vocab term: d probes per term, min cell
            t0 = time.perf_counter()
            probes = exact.select(
                "term",
                "n_true",
                F.explode(
                    F.array(*[F.lit(i) for i in range(depth)])
                ).alias("row_i"),
            ).withColumn(
                "col",
                md5_long(
                    F.concat(F.col("term"), F.concat(F.lit(":cms"), F.col("row_i")))
                )
                % width,
            )
            est = (
                probes.join(cells, ["row_i", "col"])
                .groupBy("term", "n_true")
                .agg(F.min("cell").alias("cms_estimate"))
                .withColumn(
                    "overcount", F.col("cms_estimate") - F.col("n_true")
                )
            )
            eps_bound = math.ceil(math.e * total / width)
            dist = est.agg(
                F.count(F.lit(1)).alias("n"),
                F.sum((F.col("overcount") < 0).cast("int")).alias("under"),
                F.sum((F.col("overcount") == 0).cast("int")).alias("exact_n"),
                F.mean("overcount").alias("mean"),
                F.expr("percentile(overcount, 0.5)").alias("p50"),
                F.expr("percentile(overcount, 0.99)").alias("p99"),
                F.max("overcount").alias("max"),
                F.sum(
                    (F.col("overcount") > eps_bound).cast("int")
                ).alias("over_eps_bound"),
            ).first()
            est_sec = round(time.perf_counter() - t0, 3)
            sketches.append(
                {
                    "width": width,
                    "depth": depth,
                    "cells_rows": cells.count(),
                    "build_sec": build_sec,
                    "estimate_all_sec": est_sec,
                    "undercounts": int(dist["under"]),  # MUST be 0
                    "frac_exact": round(dist["exact_n"] / dist["n"], 4),
                    "overcount_mean": round(float(dist["mean"]), 2),
                    "overcount_p50": round(float(dist["p50"]), 1),
                    "overcount_p99": round(float(dist["p99"]), 1),
                    "overcount_max": int(dist["max"]),
                    "e_bound": eps_bound,
                    "frac_over_e_bound": round(
                        dist["over_eps_bound"] / dist["n"], 6
                    ),
                }
            )
        print(
            json.dumps(
                {
                    "metric": "cms_geometry",
                    "factor": factor,
                    "documents_rows": n_docs,
                    "vocab": vocab,
                    "total_tokens": total,
                    "sketches": sketches,
                }
            )
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
