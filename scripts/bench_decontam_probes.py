"""Probe-set size ceiling for ``decontaminate_spans`` (VERDICT r14 #5).

The operator broadcasts the eval-probe n-gram set "tiny by
construction" — true of the fixture, but a real eval-suite 5-gram set
is 10⁶–10⁷ strings. This harness measures the broadcast path at
realistic probe-set sizes against the shuffle-join fallback
(``broadcast_max_probes=0`` — the ``duplicate_span_removal``
never-broadcast rule applied to the probe side), so the operator's
default cap is a measured number, not a guess.

Probe sets are deterministic: ~2% real corpus 5-grams (so the surgery
does real span work) + synthetic token-grid grams that can never match
(the realistic case — an eval suite is mostly absent from training
text), sized to P total.

Usage: python scripts/bench_decontam_probes.py [sf_dir] [factor]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark import (  # noqa: E402
    get_spark,
)
from real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (  # noqa: E402
    curation,
    text,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    spark = get_spark("bench-decontam-probes")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    if factor > 1:
        max_id = docs.agg(F.max("doc_id")).first()[0] + 1
        parts = [docs]
        for i in range(1, factor):
            parts.append(
                docs.select(
                    (F.col("doc_id") + F.lit(i * max_id)).alias("doc_id"),
                    "text",
                )
            )
        bulk = parts[0]
        for p in parts[1:]:
            bulk = bulk.unionByName(p)
        docs = bulk
    docs = docs.cache()
    n_docs = docs.count()

    # real hits: every-50th doc's leading 5-gram (the fixture grain)
    real = curation.contamination_probes(
        docs, every=50, probe_tokens=5
    ).select("probe")

    out = {
        "metric": "decontam_probe_ceiling",
        "sf_dir": sf_dir,
        "factor": factor,
        "n_docs": n_docs,
        "configs": [],
    }

    for p_total in (10_000, 100_000, 1_000_000):
        # synthetic never-match filler: 5 tokens drawn from disjoint
        # residue grids — deterministic, unique per id, ~35 B/row
        filler = spark.range(p_total).select(
            F.concat_ws(
                " ",
                F.concat(F.lit("qz"), (F.col("id") % 9973).cast("string")),
                F.concat(F.lit("wx"), (F.col("id") % 9967).cast("string")),
                F.concat(F.lit("vy"), (F.col("id") % 9949).cast("string")),
                F.concat(F.lit("uk"), (F.col("id") % 9941).cast("string")),
                F.concat(F.lit("tj"), F.col("id").cast("string")),
            ).alias("probe")
        )
        probes = real.unionByName(filler).cache()
        n_probes = probes.count()
        approx_mb = round(
            probes.select(
                F.sum(F.length("probe")).alias("b")
            ).first()["b"]
            / 1e6,
            1,
        )
        for mode, cap in (("broadcast", 10**9), ("shuffle", 0)):
            # cold-ish first pass compiles the plan; report the warm
            best = float("inf")
            rows = None
            for _ in range(2):
                t0 = time.perf_counter()
                res = text.decontaminate_spans(
                    docs, probes, n=5, broadcast_max_probes=cap
                )
                rows = res.filter(F.col("n_removed") > 0).count()
                best = min(best, time.perf_counter() - t0)
            out["configs"].append(
                {
                    "probes": n_probes,
                    "probe_mb": approx_mb,
                    "mode": mode,
                    "docs_touched": rows,
                    "warm_sec": round(best, 2),
                }
            )
        probes.unpersist()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
