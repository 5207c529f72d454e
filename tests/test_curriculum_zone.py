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


def test_write_curriculum_zone_collision_and_relanding(spark, tmp_path):
    """An input corpus that already carries placement-named columns
    (n_tokens / phase / shard / bin_id / offset_in_bin — e.g. a
    RE-LANDED curriculum zone) must not produce ambiguous duplicates:
    the placement frame owns those names in the landed table
    (ADVICE r15)."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    zone1 = str(tmp_path / "z1")
    specs1 = curation.write_curriculum_zone(docs, zone1, n_shards=4)
    landed1 = spark.read.parquet(specs1["curriculum_docs"]["path"])
    # the landed zone carries placement columns — re-land it verbatim
    zone2 = str(tmp_path / "z2")
    specs2 = curation.write_curriculum_zone(landed1, zone2, n_shards=4)
    landed2 = spark.read.parquet(specs2["curriculum_docs"]["path"])
    assert sorted(landed2.columns) == sorted(landed1.columns)  # no dups
    # placement is identical (same doc_id/text universe, same seed)
    key = lambda df: sorted(
        map(
            tuple,
            df.select(
                "doc_id", "phase", "shard", "bin_id", "offset_in_bin"
            ).collect(),
        )
    )
    assert key(landed2) == key(landed1)


def test_ingest_to_curriculum_is_decontaminated(spark, tmp_path):
    """Lifecycle: ingest-gate decontamination → curriculum landing
    (VERDICT r15 #7). The ingest gate span-cleans arriving docs
    against the eval-probe set BEFORE the corpus zone lands; the
    curriculum writer consumes the landed zone — so no curriculum
    shard can contain a contaminated span. Gate-order is the payoff:
    the curriculum writer needs no probe knowledge at all."""
    from real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.streaming.pipeline import (
        read_manifest_zone,
        run_corpus_ingest,
    )

    raw = str(tmp_path / "raw")
    zone = str(tmp_path / "zone")
    ckpt = str(tmp_path / "ckpt")
    prefix = "t_curr_decontam_"
    table = f"{prefix}documents"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    probe_text = "the leaked eval answer text"
    probes = spark.createDataFrame([(probe_text,)], "probe string")
    try:
        spark.createDataFrame(
            [
                (1, f"intro words {probe_text} outro and more prose"),
                (2, "perfectly clean prose here with many words"),
                (3, probe_text),  # fully contaminated: drops
                (4, "another clean document of decent length indeed"),
            ],
            "doc_id long, text string",
        ).write.mode("append").parquet(raw)
        run_corpus_ingest(
            spark, raw, zone, ckpt,
            decontaminate_probes=probes,
            n_buckets=4, table_prefix=prefix,
        )
        corpus = read_manifest_zone(
            spark, {"documents": table}, zone
        )["documents"].select("doc_id", "text")
        czone = str(tmp_path / "curriculum")
        specs = curation.write_curriculum_zone(
            corpus, czone, n_phases=2, budget=8, n_shards=2
        )
        landed = spark.read.parquet(specs["curriculum_docs"]["path"])
        rows = landed.select("doc_id", "text").collect()
        assert {r["doc_id"] for r in rows} == {1, 2, 4}
        for r in rows:
            assert probe_text not in r["text"], (
                f"contaminated span reached curriculum shard: {r}"
            )
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")
