"""The mountable curriculum zone (ROADMAP r16 #3, pulled forward):
write_curriculum_zone lands placement-annotated docs partitioned by
phase/shard plus the (phase, shard, bin) manifest derived from the
same placement frame.

Value contracts:
* landed docs re-aggregate to the landed manifest EXACTLY (one
  placement frame, no recompute drift);
* the manifest equals curriculum_pack's (the declared query);
* a phase-restricted read directory-prunes (PartitionFilters);
* every doc lands exactly once with its text intact.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
    curation,
)

SF_DIR = "/root/testdata/sf0.001"


def test_curriculum_zone_roundtrip_and_pruning(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    zone = str(tmp_path / "zone")
    specs = curation.write_curriculum_zone(
        docs, zone, n_phases=4, budget=512, n_shards=8
    )
    assert specs["curriculum_docs"]["partition_by"] == ["phase", "shard"]

    landed = spark.read.schema(
        "doc_id long, text string, n_tokens long, bin_id long, "
        "offset_in_bin long, phase long, shard long"
    ).parquet(specs["curriculum_docs"]["path"])
    manifest = spark.read.parquet(specs["curriculum_manifest"]["path"])

    # every doc exactly once, text byte-identical
    assert landed.count() == docs.count()
    orig = {r["doc_id"]: r["text"] for r in docs.collect()}
    for r in landed.select("doc_id", "text").collect():
        assert orig[r["doc_id"]] == r["text"]

    # landed docs re-aggregate to the landed manifest exactly
    reagg = (
        landed.groupBy("phase", "shard", "bin_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
            F.min("doc_id").alias("first_doc_id"),
            F.max("doc_id").alias("last_doc_id"),
        )
    )
    key = lambda df: sorted(map(tuple, df.collect()))
    assert key(reagg) == key(manifest)

    # ... and the manifest IS curriculum_pack's declared result
    assert key(manifest) == key(
        curation.curriculum_pack(docs, n_phases=4, budget=512, n_shards=8)
    )

    # phase-restricted read prunes directories
    pruned = landed.filter(F.col("phase") == 1)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "phase" in plan.split(
        "PartitionFilters"
    )[1][:200], f"phase filter did not reach the scan:\n{plan[:2000]}"
    n_phase1 = manifest.filter(F.col("phase") == 1).agg(
        F.sum("n_docs")
    ).first()[0]
    assert pruned.count() == n_phase1
