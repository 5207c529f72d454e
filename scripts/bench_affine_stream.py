"""Read-fraction line for the affine router over the multi-generation
streamed serve (VERDICT r14 #4's measurement half).

Zone: two waves (corpus ×factor, then its ×100-scaled drift twin under
offset ids) through the IVFPQ-only store-once ingest — two live
generations, codes partitioned by cluster_id. Served three ways over a
10-query batch:

* plain multigen serve — ONE scan, DPP admits the UNION of the batch's
  probed cluster_ids across both generations;
* affine-routed serve (``affine_max_cells``) — per-group scans, each
  admitting ≤ max_cells composite (gen, cell) probes;
* a signature-affine batch (the largest router bucket of a 200-query
  pool) — the router's intended batch composition, whose single scan
  reads ~the single-query fraction.

Bytes are attributed by walking the codes zone's cluster_id=... file
sizes (file pruning is by cluster_id — ``gen`` filters rows INSIDE a
cell, it is not a partition dir), exactly the bench_ivf_dpp.py method.

Usage: python scripts/bench_affine_stream.py [sf_dir] [factor]
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
from real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators.similarity import (  # noqa: E402
    cell_affine_groups,
)
from real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.streaming.pipeline import (  # noqa: E402
    _load_ivfpq_multigen,
    _multigen_probe_rows,
    ivfpq_topk_streamed,
    run_embedding_ingest,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    n_probe = 4
    spark = get_spark("bench-affine-stream")
    spark.sparkContext.setLogLevel("ERROR")

    tmp = tempfile.mkdtemp(prefix="affine_stream_")
    tables: dict[str, str] = {}
    out: dict = {
        "metric": "affine_stream_read_fraction",
        "sf_dir": sf_dir,
        "factor": factor,
        "n_probe": n_probe,
    }
    try:
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
            "vec_id", "embedding"
        )
        max_id = emb.agg(F.max("vec_id")).first()[0] + 1
        parts = [emb]
        for i in range(1, factor):
            parts.append(
                emb.select(
                    (F.col("vec_id") + F.lit(i * max_id)).alias("vec_id"),
                    "embedding",
                )
            )
        bulk = parts[0]
        for p in parts[1:]:
            bulk = bulk.unionByName(p)
        drift = bulk.select(
            (F.col("vec_id") + F.lit(factor * max_id)).alias("vec_id"),
            F.transform(
                "embedding", lambda x: (x * 100).cast("float")
            ).alias("embedding"),
        )
        raw = os.path.join(tmp, "raw")
        zone = os.path.join(tmp, "zone")
        ckpt = os.path.join(tmp, "ckpt")
        for wave in (bulk, drift):
            wave.write.mode("append").parquet(raw)
            tables = run_embedding_ingest(
                spark, raw, zone, ckpt,
                pq=False, ivfpq=True, ivf=False,
                table_prefix="affstream_",
                store_flat_embeddings=False,
            )
        out["n_vectors"] = 2 * factor * max_id

        meta, codes_g, cents_g, cb_g = _load_ivfpq_multigen(
            spark, tables["ivfpq_codes"], zone
        )
        out["n_gens"] = cents_g.select("gen").distinct().count()

        # cluster_id-keyed on-disk bytes of the codes zone
        loc = (
            spark.sql(
                f"DESCRIBE FORMATTED {tables['ivfpq_codes']}"
            )
            .filter(F.col("col_name") == "Location")
            .first()["data_type"]
        ).replace("file:", "")
        sizes: dict[int, int] = {}
        for root, _dirs, files in os.walk(loc):
            cell = None
            for part in root.split(os.sep):
                if part.startswith("cluster_id="):
                    cell = int(part.split("=", 1)[1])
            for f in files:
                if f.endswith(".parquet") and cell is not None:
                    sizes[cell] = sizes.get(cell, 0) + os.path.getsize(
                        os.path.join(root, f)
                    )
        total = sum(sizes.values())
        out["codes_bytes_total"] = total

        def frac(cells: set[int]) -> float:
            return round(sum(sizes.get(c, 0) for c in cells) / total, 4)

        # mixed 10-query batch: the plain serve's union fraction vs
        # the affine groups' per-scan fractions
        queries = emb.filter(F.col("vec_id") < 10)
        rows = _multigen_probe_rows(
            queries, cents_g, n_probe
        ).collect()
        per_q: dict[int, set] = {}
        for r in rows:
            per_q.setdefault(r["query_id"], set()).add(
                (r["gen"], r["cluster_id"])
            )
        union_cids = {c for cs in per_q.values() for (_g, c) in cs}
        out["mixed_batch_union_read_fraction"] = frac(union_cids)

        cell_ids = {
            gc: i
            for i, gc in enumerate(
                sorted({(r["gen"], r["cluster_id"]) for r in rows})
            )
        }
        inv = {i: gc for gc, i in cell_ids.items()}
        groups = cell_affine_groups(
            [
                (r["query_id"], cell_ids[(r["gen"], r["cluster_id"])])
                for r in rows
            ],
            2 * n_probe * out["n_gens"],
        )
        group_fracs = [
            frac({inv[c][1] for c in cells}) for _qids, cells in groups
        ]
        out["mixed_batch_n_groups"] = len(groups)
        out["mixed_batch_max_group_read_fraction"] = max(group_fracs)
        out["mixed_batch_total_grouped_read_fraction"] = round(
            sum(group_fracs), 4
        )

        # signature-affine batch: the router's intended composition
        pool = emb.filter(F.col("vec_id") < 500)
        prow = _multigen_probe_rows(pool, cents_g, n_probe).collect()
        pool_cells = {
            gc: i
            for i, gc in enumerate(
                sorted({(r["gen"], r["cluster_id"]) for r in prow})
            )
        }
        routed = cell_affine_groups(
            [
                (r["query_id"], pool_cells[(r["gen"], r["cluster_id"])])
                for r in prow
            ],
            2 * n_probe * out["n_gens"],
        )
        members, aff_cells = max(routed, key=lambda g: (len(g[0]), g[0]))
        inv_pool = {i: gc for gc, i in pool_cells.items()}
        affine_ids = sorted(members)[:10]
        out["affine_batch_size"] = len(affine_ids)
        out["affine_batch_read_fraction"] = frac(
            {inv_pool[c][1] for c in aff_cells}
        )

        # warm serve walls: plain vs affine-routed on the mixed batch
        def timed(fn, reps=2):
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                fn().write.mode("overwrite").format("noop").save()
                best = min(best, time.perf_counter() - t0)
            return round(best, 2)

        out["plain_serve_sec"] = timed(
            lambda: ivfpq_topk_streamed(
                spark, tables["ivfpq_codes"], zone, queries, k=5,
            )
        )
        out["affine_serve_sec"] = timed(
            lambda: ivfpq_topk_streamed(
                spark, tables["ivfpq_codes"], zone, queries, k=5,
                affine_max_cells=2 * n_probe * out["n_gens"],
            )
        )
        print(json.dumps(out))
    finally:
        for t in tables.values():
            spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
