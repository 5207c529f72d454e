"""The session-shared state-zone seam (VERDICT r8 #2 / r9 #2, ADVICE
r9 #2): one landed zone per (name, corpus signature); cache hits serve
the landed parquet, a changed or unreadable input can never be served
a stale zone."""

from __future__ import annotations

import os
import shutil

import pyspark.sql.functions as F

from real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark import (
    queries as Q,
)

SF = "/root/testdata/sf0.001"


def test_corpus_state_zone_is_served_from_cache(spark):
    """Two calls with the same corpus signature return the SAME landed
    zone directory — the build runs once per session."""
    z1 = Q._corpus_state_zone(spark, SF)
    z2 = Q._corpus_state_zone(spark, SF)
    assert z1 == z2 and os.path.isdir(z1)
    # and both the grain and the derived tables are in it
    for t in ("token_events", "feature_state", "fh_vectors"):
        assert os.path.isdir(os.path.join(z1, t)), t


def test_changed_corpus_rebuilds_the_zone(spark, tmp_path):
    """A modified input (different file set / mtimes) must MISS the
    cache and rebuild — never serve the stale zone (ADVICE r9)."""
    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(40)
    docs.write.parquet(f"{sf}/documents.parquet")
    z1 = Q._corpus_state_zone(spark, sf)
    # append a file: the recursive signature changes
    docs.limit(5).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        *[c for c in docs.columns if c != "doc_id"],
    ).write.mode("append").parquet(f"{sf}/documents.parquet")
    z2 = Q._corpus_state_zone(spark, sf)
    assert z1 != z2


def test_nested_partitioned_input_has_nonempty_signature(spark, tmp_path):
    """ADVICE r9 #2: a PARTITIONED input directory (nested parquet
    files) must produce a non-empty signature — the old top-level
    glob returned () and froze the cache key."""
    sf = str(tmp_path / "sfp")
    os.makedirs(sf)
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(40)
    docs.withColumn("pk", F.col("doc_id") % 3).write.partitionBy(
        "pk"
    ).parquet(f"{sf}/documents.parquet")
    sig = Q._input_signature(sf, "documents")
    assert len(sig) >= 3  # at least one file per partition dir
    assert all("/" in rel or os.sep in rel for rel, _s, _m in sig)


def test_empty_signature_never_caches(spark, tmp_path):
    """An input layout the signature walker cannot see (no parquet
    files) always rebuilds into a fresh dir — a cache keyed on () would
    serve arbitrary stale state."""
    calls = []

    def build(zone):
        calls.append(zone)
        os.makedirs(zone, exist_ok=True)

    sf = str(tmp_path / "nothing")
    os.makedirs(os.path.join(sf, "documents.parquet"))
    z1 = Q._shared_state_zone("t_empty_sig", sf, build)
    z2 = Q._shared_state_zone("t_empty_sig", sf, build)
    assert len(calls) == 2 and z1 != z2
