"""Streaming-maintained binary-quantization model: the embedding
ingest's binary gate fits per-dim thresholds on the first epoch,
ENCODES later arrivals against the landed thresholds (no refit,
committed vectors never re-encoded), refits on mean-L1-deviation
drift — and every state it lands is replay-parity-exact vs the batch
build (binary_thresholds + binary_encode over the same corpus)."""

from __future__ import annotations

import pytest
import os

import pyspark.sql.functions as F

from real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators.similarity import (
    binary_encode,
    binary_thresholds,
)
from real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.streaming.pipeline import (
    BINARY_MODEL_DIR,
    _read_model_meta,
    read_binary_codes,
    read_binary_thresholds,
    run_embedding_ingest,
)

SF = "/root/testdata/sf0.001"


def _emb(spark, limit=200):
    return (
        spark.read.parquet(f"{SF}/embeddings.parquet")
        .select("vec_id", "embedding")
        .filter(F.col("vec_id") < limit)
    )


def _codes_key(df):
    return sorted(
        (r["vec_id"], r["code_lo"], r["code_hi"]) for r in df.collect()
    )


def _thr_key(df):
    return sorted(
        (r["dim_idx"], r["threshold"]) for r in df.collect()
    )


def test_binary_gate_single_epoch_matches_batch_build(spark, tmp_path):
    """One delivery = one epoch: the gen-0 threshold fit runs on
    exactly the corpus the batch build fits on (per-dim decimal-exact
    means are delivery-order-free), so the landed thresholds AND the
    landed codes are bit-identical to binary_thresholds +
    binary_encode."""
    raw, zone, ckpt = (str(tmp_path / d) for d in ("raw", "zone", "ckpt"))
    prefix = "t_bin1_"
    tables = {}
    try:
        emb = _emb(spark)
        emb.write.mode("append").parquet(raw)
        tables = run_embedding_ingest(
            spark, raw, zone, ckpt,
            pq=False, binary=True, n_buckets=4, table_prefix=prefix,
        )
        assert "binary_codes" in tables and "pq_codes" not in tables
        want_thr = binary_thresholds(emb)
        got_thr = read_binary_thresholds(spark, zone)
        assert _thr_key(got_thr) == _thr_key(want_thr)
        got = _codes_key(
            read_binary_codes(spark, tables["binary_codes"], zone)
        )
        want = _codes_key(binary_encode(emb, want_thr))
        assert got == want and len(got) == 200
        meta = _read_model_meta(zone, BINARY_MODEL_DIR)
        assert meta["gen"] == 0 and meta["fit_mean_dist"] is not None
    finally:
        for t in tables.values():
            spark.sql(f"DROP TABLE IF EXISTS {t}")


@pytest.mark.slow
def test_binary_gate_incremental_then_drift_refit(spark, tmp_path):
    """Three waves: wave 1 fits gen 0; wave 2 is ENCODED against the
    frozen landed thresholds (no refit — the merged codes equal the
    frozen-threshold encode of both waves, NOT a full-corpus refit);
    wave 3 arrives ×100-scaled, its mean L1 deviation blows past the
    default 2× drift factor, the thresholds refit over the full
    committed corpus + batch (gen 1) and the full re-encode equals
    the batch build over all three waves. A replayed run is a
    no-op."""
    raw, zone, ckpt = (str(tmp_path / d) for d in ("raw", "zone", "ckpt"))
    prefix = "t_bin3_"
    tables = {}
    try:
        base = _emb(spark)
        w1 = base.filter(F.col("vec_id") < 150)
        w2 = base.filter(F.col("vec_id") >= 150)
        w3 = base.filter(F.col("vec_id") >= 150).select(
            (F.col("vec_id") + 1000).alias("vec_id"),
            F.transform(
                "embedding", lambda x: (x * 100).cast("float")
            ).alias("embedding"),
        )

        w1.write.mode("append").parquet(raw)
        tables = run_embedding_ingest(
            spark, raw, zone, ckpt,
            pq=False, binary=True, n_buckets=4, table_prefix=prefix,
        )
        assert _read_model_meta(zone, BINARY_MODEL_DIR)["gen"] == 0
        thr0 = read_binary_thresholds(spark, zone)
        assert _thr_key(thr0) == _thr_key(binary_thresholds(w1))

        # wave 2: steady state — frozen gen-0 thresholds encode the
        # arrivals; the merged zone is the frozen-threshold encode of
        # the full corpus (thresholds deliberately NOT the full-corpus
        # means — that is what "no refit" means)
        w2.write.mode("append").parquet(raw)
        run_embedding_ingest(
            spark, raw, zone, ckpt,
            pq=False, binary=True, n_buckets=4, table_prefix=prefix,
        )
        assert _read_model_meta(zone, BINARY_MODEL_DIR)["gen"] == 0
        got = _codes_key(
            read_binary_codes(spark, tables["binary_codes"], zone)
        )
        want = _codes_key(binary_encode(base, thr0))
        assert got == want and len(got) == 200

        # wave 3: ×100-scaled arrivals — L1-deviation drift under the
        # default 2× factor triggers a gen-1 refit over committed +
        # batch; the landed state equals the batch build over all
        all_vecs = base.unionByName(w3)
        w3.write.mode("append").parquet(raw)
        run_embedding_ingest(
            spark, raw, zone, ckpt,
            pq=False, binary=True, n_buckets=4, table_prefix=prefix,
        )
        meta = _read_model_meta(zone, BINARY_MODEL_DIR)
        assert meta["gen"] == 1
        thr1 = read_binary_thresholds(spark, zone)
        assert _thr_key(thr1) == _thr_key(binary_thresholds(all_vecs))
        got = _codes_key(
            read_binary_codes(spark, tables["binary_codes"], zone)
        )
        want = _codes_key(binary_encode(all_vecs, thr1))
        assert got == want and len(got) == all_vecs.count()
        assert os.path.isdir(os.path.join(zone, BINARY_MODEL_DIR, "gen=1"))

        # replay: nothing new — codes, meta, and gen unchanged
        run_embedding_ingest(
            spark, raw, zone, ckpt,
            pq=False, binary=True, n_buckets=4, table_prefix=prefix,
        )
        assert _read_model_meta(zone, BINARY_MODEL_DIR)["gen"] == 1
        assert (
            _codes_key(
                read_binary_codes(spark, tables["binary_codes"], zone)
            )
            == got
        )
    finally:
        for t in tables.values():
            spark.sql(f"DROP TABLE IF EXISTS {t}")
