"""HyperLogLog accuracy at a REALISTIC vocabulary (VERDICT r11 #5):
the registered query's in-query gate runs at sf corpora whose 31
distinct words sit deep in the linear-counting regime, where the
estimator is trivially exact — this harness measures the OBSERVED
relative-error distribution of the register-table HLL in the regime
the p=10 claim actually lives in (tens of thousands of distincts,
raw bias-corrected estimator).

Vocabulary: the compound-word derivation shared with
bench_cms_geometry.py / bench_bpe_depth.py (consecutive token triples
concatenated) over the ×factor-replicated corpus — ~50k/~90k types at
×10/×30.

Error distribution: HLL yields ONE estimate per corpus, so the
distribution is sampled over TRIALS, each salting the term stream
with an injective prefix (``s<k>:term``) — distinct count unchanged,
hash function independent per trial, exactly the standard multi-seed
evaluation of a sketch estimator.

Usage: python scripts/bench_hll_accuracy.py [factor] [sf_dir]
Prints one JSON line {"metric": "hll_accuracy", "runs": [...]}.
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TRIALS = 16


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

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

    spark = get_spark("bench-hll-accuracy")
    spark.sparkContext.setLogLevel("ERROR")

    tmp = tempfile.mkdtemp(prefix="hll_acc_")
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
        for pt in parts[1:]:
            all_docs = all_docs.unionByName(pt)
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

        # the distinct term table, landed once and reused per trial
        sdocs.select(
            F.explode(text.tokens(F.lower(F.col("text")))).alias("term")
        ).distinct().write.mode("overwrite").parquet(f"{tmp}/vocab.parquet")
        vocab_df = spark.read.parquet(f"{tmp}/vocab.parquet")
        exact = vocab_df.count()

        runs = []
        for p in (10, 12):
            m = 1 << p
            alpha = 0.7213 / (1.0 + 1.079 / m)
            scale = float(2**49)
            errs = []
            regimes = set()
            for k in range(TRIALS):
                salted = vocab_df.select(
                    F.concat(F.lit(f"s{k}:"), F.col("term")).alias("term")
                )
                regs = text.hll_registers_from_terms(salted, p=p)
                row = regs.agg(
                    F.count(F.lit(1)).cast("long").alias("v"),
                    F.sum(
                        F.pow(
                            F.lit(2.0), F.lit(49) - F.col("rho")
                        ).cast("decimal(38,0)")
                    )
                    .cast("double")
                    .alias("s"),
                ).first()
                n_occ, s = int(row["v"]), float(row["s"])
                raw_e = (alpha * m * m * scale) / (
                    s + (m - n_occ) * scale
                )
                if raw_e <= 2.5 * m and n_occ < m:
                    est = m * math.log(m / (m - n_occ))
                    regimes.add("linear_counting")
                else:
                    est = raw_e
                    regimes.add("raw")
                errs.append((est - exact) / exact)
            abs_errs = sorted(abs(e) for e in errs)
            sigma = 1.04 / math.sqrt(m)
            runs.append(
                {
                    "p": p,
                    "m": m,
                    "exact_vocab": exact,
                    "trials": TRIALS,
                    "regimes": sorted(regimes),
                    "theoretical_sigma": round(sigma, 5),
                    "mean_rel_err": round(
                        sum(errs) / len(errs), 5
                    ),
                    "mean_abs_rel_err": round(
                        sum(abs_errs) / len(abs_errs), 5
                    ),
                    "max_abs_rel_err": round(abs_errs[-1], 5),
                    "within_1_sigma": sum(
                        1 for e in abs_errs if e <= sigma
                    ),
                    "within_2_sigma": sum(
                        1 for e in abs_errs if e <= 2 * sigma
                    ),
                }
            )
        print(
            json.dumps(
                {
                    "metric": "hll_accuracy",
                    "factor": factor,
                    "sf_dir": sf_dir,
                    "runs": runs,
                }
            )
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
