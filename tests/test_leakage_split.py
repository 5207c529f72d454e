"""Leakage-safe train/val/test split (curation.leakage_safe_split).

Value contracts:
* no group key ever straddles two splits — for BOTH the exact
  fingerprint and SimHash group notions, end-to-end through the
  group-key derivation (the structural guarantee, pinned on real
  corpus data, not just by construction);
* crafted exact duplicates land in the same split;
* proportions converge to the percentile bands at GROUP grain;
* re-running reproduces the split bit-for-bit; changing the salt
  moves docs (the knob is live);
* invalid percentage combinations are rejected.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
    curation,
    dedup,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def _no_straddle(split_df):
    return (
        split_df.groupBy("group_key")
        .agg(F.countDistinct("split").alias("n_splits"))
        .filter(F.col("n_splits") > 1)
        .count()
    )


def test_exact_groups_never_straddle(spark, docs):
    out = curation.leakage_safe_split(
        curation.exact_fingerprint(docs), "fingerprint"
    )
    assert _no_straddle(out) == 0
    assert out.count() == docs.count()


def test_simhash_groups_never_straddle(spark, docs):
    out = curation.leakage_safe_split(
        dedup.simhash(docs, bits=48), "simhash"
    )
    assert _no_straddle(out) == 0


def test_crafted_duplicates_co_travel(spark):
    rows = [
        (1, "the same   DOCUMENT text"),
        (2, "THE same document\ttext"),  # normalizes identically
        (3, "a different document entirely"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: (r["group_key"], r["split"])
        for r in curation.leakage_safe_split(
            curation.exact_fingerprint(df), "fingerprint"
        ).collect()
    }
    assert out[1] == out[2]
    assert out[1][0] != out[3][0]


def test_proportions_and_determinism(spark, docs):
    fp = curation.exact_fingerprint(docs)
    a = curation.leakage_safe_split(fp, "fingerprint")
    counts = {
        r["split"]: r["n"]
        for r in a.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    n = sum(counts.values())
    # hash buckets over ~hundreds of groups: generous tolerance, the
    # point is "roughly the bands", not a binomial-tail assertion
    assert counts.get("train", 0) / n == pytest.approx(0.8, abs=0.1)
    assert 0 < counts.get("val", 0) / n < 0.25
    assert 0 < counts.get("test", 0) / n < 0.25
    b = curation.leakage_safe_split(fp, "fingerprint")
    assert a.exceptAll(b).count() == 0
    moved = (
        curation.leakage_safe_split(fp, "fingerprint", salt="other")
        .withColumnRenamed("split", "split2")
        .select("doc_id", "split2")
        .join(a.select("doc_id", "split"), "doc_id")
        .filter(F.col("split") != F.col("split2"))
        .count()
    )
    assert moved > 0


def test_invalid_percentages_raise(spark, docs):
    fp = curation.exact_fingerprint(docs)
    with pytest.raises(ValueError, match="percentages"):
        curation.leakage_safe_split(fp, "fingerprint", train_pct=95, val_pct=10)
    with pytest.raises(ValueError, match="percentages"):
        curation.leakage_safe_split(fp, "fingerprint", train_pct=0)
