"""Affine-routing WALL-CLOCK crossover (VERDICT r15 #4): at what
corpus size does signature-affine batch composition start beating
mixed batches on wall, on this box?

The physics (cell_affine_groups' docstring, sharpened here into a
measured line): DPP admits the UNION of a batch's probed cells, and a
post-hoc split of a mixed batch can never read fewer total bytes than
that union — so the composed mixed-batch router trades (G−1) extra
plan constants for a bounded per-scan working set, and NEVER inverts
on wall at any scale. The shape that DOES invert is upstream BATCH
COMPOSITION: the same query pool served as signature-affine batches
instead of mixed batches reads ~n_probe/n_clusters of the codes zone
per batch instead of the mixed union, at EQUAL batch/plan count — so
affine wins wall as soon as the per-batch scan-byte saving outruns
measurement noise.

Protocol: fit the IVFPQ model once on the base corpus, inflate the
CODES table ×factor under offset ids (scan bytes are the variable —
the model stays fixed, queries score identically many candidate rows
per probed cell copy either way), land it partitioned by cluster_id,
and serve ONE pool of queries two ways at equal batch count:

* mixed  — batches stratified ACROSS two disjoint probe-signature
  groups (each batch's union = both groups' cells);
* affine — the router's batches (each batch = one signature group,
  union = that group's cells — half the mixed union here).

Each serve is one warm end-to-end ADC top-k per batch (noop-sink
discipline); admitted bytes are attributed by walking the zone's
cluster_id=... directory sizes (the bench_ivf_dpp.py method).

Usage: python scripts/bench_affine_crossover.py [sf_dir] [factor]
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

from pyspark.sql import functions as F  # noqa: E402

from real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark import (  # noqa: E402
    get_spark,
)
from real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (  # noqa: E402
    similarity,
)


def _dir_bytes(zone: str, cells: set[int] | None = None) -> int:
    """Bytes under the zone's cluster_id=... partition dirs — all of
    them when ``cells`` is None (cluster ids are strided vec_ids, not
    0..n_clusters)."""
    total = 0
    for d in os.listdir(zone):
        if not d.startswith("cluster_id="):
            continue
        if cells is not None and int(d.split("=")[1]) not in cells:
            continue
        full = os.path.join(zone, d)
        for f in os.listdir(full):
            total += os.path.getsize(os.path.join(full, f))
    return total


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    n_probe, k = 4, 10
    spark = get_spark("bench-affine-crossover")
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    cent, cb, codes = similarity.ivfpq_model(emb)
    cent, cb = cent.cache(), cb.cache()
    max_id = emb.agg(F.max("vec_id")).first()[0] + 1

    # inflate CODES under offset ids: scan bytes scale with factor,
    # the model and per-cell membership distribution stay fixed. A
    # broadcast range crossJoin keeps the plan O(1) in factor (a
    # factor-wide union would be plan-quadratic by ×1000).
    reps = spark.range(factor).select(F.col("id").alias("_rep"))
    bulk = codes.crossJoin(F.broadcast(reps)).select(
        (F.col("vec_id") + F.col("_rep") * max_id).alias("vec_id"),
        "cluster_id", "s", "code",
    )

    tmp = tempfile.mkdtemp(prefix="affine_crossover_")
    zone = os.path.join(tmp, "codes")
    try:
        # round-robin repartition → every cell dir lands ~32 files, so
        # scan parallelism is split-granular in BOTH modes (a single
        # file per cell makes a 4-cell scan 4 tasks — a toy-layout
        # artifact; a 100 TB cell spans thousands of files)
        bulk.repartition(32).write.partitionBy("cluster_id").parquet(zone)
        zcodes = spark.read.schema(
            "vec_id long, s long, code long, cluster_id long"
        ).parquet(zone)

        # two signature groups with DISJOINT probe-cell sets, same size
        pool = emb  # whole base corpus: signature groups need population
        probe_rows = [
            (r["query_id"], r["cluster_id"])
            for r in similarity.ivf_probe_assignments(
                pool, cent.select(
                    F.col("cid"), F.col("cvec").alias("centroid_vec")
                ), n_probe=n_probe,
            ).collect()
        ]
        sig: dict[int, tuple[int, ...]] = {}
        for qid, cell in probe_rows:
            sig.setdefault(qid, ())
            sig[qid] = tuple(sorted(sig[qid] + (cell,)))
        by_sig: dict[tuple[int, ...], list[int]] = {}
        for qid, s in sig.items():
            by_sig.setdefault(s, []).append(qid)
        sigs = sorted(by_sig, key=lambda s: -len(by_sig[s]))
        ga = None
        for i, sa in enumerate(sigs):
            for sb in sigs[i + 1:]:
                if not (set(sa) & set(sb)):
                    ga, gb = sa, sb
                    break
            if ga:
                break
        assert ga, "no disjoint signature pair in the pool"
        n = min(len(by_sig[ga]), len(by_sig[gb]))
        qa, qb = sorted(by_sig[ga])[:n], sorted(by_sig[gb])[:n]

        def serve(qids: list[int]) -> None:
            q = emb.filter(F.col("vec_id").isin(qids))
            similarity.ivfpq_topk(
                emb, q, k=k, n_probe=n_probe,
                centroids=cent, codebook=cb, codes=zcodes,
            ).write.mode("overwrite").format("noop").save()

        half = n // 2
        batches = {
            "mixed": [qa[:half] + qb[:half], qa[half:] + qb[half:]],
            "affine": [qa, qb],
        }
        out = {
            "metric": "affine_crossover",
            "sf_dir": sf_dir,
            "factor": factor,
            "codes_rows": zcodes.count(),
            "zone_bytes": _dir_bytes(zone),
            "n_queries_per_side": 2 * half,
            "cells_a": list(ga),
            "cells_b": list(gb),
        }
        for mode in ("mixed", "affine"):
            serve(batches[mode][0])  # warm plans/codegen once
            t0 = time.perf_counter()
            for b in batches[mode]:
                serve(b)
            wall = round(time.perf_counter() - t0, 3)
            cells = [
                set(ga) | set(gb) if mode == "mixed"
                else set(ga if b is batches[mode][0] else gb)
                for b in batches[mode]
            ]
            out[mode] = {
                "wall_sec": wall,
                "batch_cells": [sorted(c) for c in cells],
                "scan_bytes": sum(_dir_bytes(zone, c) for c in cells),
            }
        out["affine_wins"] = (
            out["affine"]["wall_sec"] < out["mixed"]["wall_sec"]
        )
        print(json.dumps(out))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
