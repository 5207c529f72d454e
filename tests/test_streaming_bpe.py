"""Streaming-maintained BPE tokenizer (VERDICT r11 #3 — the last
learned model without an ingest gate): the corpus ingest's BPE gate
learns on the first epoch, lands per-epoch word counts as mergeable
SUM state, refits FROM THE FOLDED COUNTS on fragmentation drift
(zero text re-scans), and every landed state is replay-parity-exact
vs the batch learn over the same corpus."""

from __future__ import annotations

import pytest
import os

import pyspark.sql.functions as F

from real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
    text,
)
from real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.streaming.pipeline import (
    BPE_MODEL_DIR,
    _read_model_meta,
    committed_epochs,
    compact_bpe_word_counts,
    read_bpe_model,
    read_bpe_word_counts,
    run_corpus_ingest,
)

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    )


def _words_of(docs):
    """The batch derivation of the weighted word-type table — the
    spec the gate's grain-slice aggregate must match bit-for-bit."""
    return (
        docs.select(
            F.explode(
                F.split(F.trim(F.lower(F.col("text"))), r"\s+")
            ).alias("word")
        )
        .filter(F.col("word").rlike("^[a-z0-9]+$"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def _merge_key(df):
    return sorted(
        (
            r["merge_rank"],
            r["sym_left"],
            r["sym_right"],
            r["merged"],
            r["pair_count"],
        )
        for r in df.collect()
    )


def _vocab_key(df):
    return sorted((r["seq"], r["n"]) for r in df.collect())


def _counts_key(df):
    return sorted((r["word"], r["n"]) for r in df.collect())


def _run(spark, raw, zone, ckpt, prefix):
    return run_corpus_ingest(
        spark, raw, zone, ckpt,
        state_refresh=True, learn_bpe=True, bpe_merges=8,
        n_buckets=4, table_prefix=prefix,
    )


@pytest.mark.slow
def test_bpe_gate_learn_fold_drift_replay_compact(spark, tmp_path):
    """The full lifecycle: wave 1 learns gen 0 (bit-equal to the
    batch bpe_learn_merges_from_words over the same word counts);
    wave 2 is counts-only (meta untouched, folded counts = both
    waves); wave 3 arrives as unseen long words — fragmentation under
    the frozen merge table blows past the fit-time mean, so the gate
    refits gen 1 FROM THE FOLDED COUNTS, equal to the batch learn
    over all three waves' words; replay is a no-op; count compaction
    folds to one pre-summed epoch, reader-identical."""
    raw, zone, ckpt = (str(tmp_path / d) for d in ("raw", "zone", "ckpt"))
    prefix = "t_bpe3_"
    tables = {}
    try:
        base = _docs(spark)
        w1 = base.filter(F.col("doc_id") < 40)
        w2 = base.filter(F.col("doc_id") >= 40)
        # unseen, long, [a-z0-9]+ words: char-level under the learned
        # merges, so mean subwords/occurrence far exceeds the fit mean
        w3 = spark.createDataFrame(
            [
                (10_000 + i, " ".join(
                    f"zqxjvkwpfy{i}{j}gmbhdtnrls" for j in range(8)
                ))
                for i in range(10)
            ],
            "doc_id long, text string",
        )

        w1.write.mode("append").parquet(raw)
        tables = _run(spark, raw, zone, ckpt, prefix)
        assert _read_model_meta(zone, BPE_MODEL_DIR)["gen"] == 0
        merges0, vocab0 = read_bpe_model(spark, zone)
        want_m0, want_v0 = text.bpe_learn_merges_from_words(
            _words_of(w1), str(tmp_path / "b0"), n_merges=8,
            return_vocab=True,
        )
        assert _merge_key(merges0) == _merge_key(want_m0)
        assert _vocab_key(vocab0) == _vocab_key(want_v0)
        assert _counts_key(
            read_bpe_word_counts(spark, tables["bpe_word_counts"], zone)
        ) == _counts_key(_words_of(w1))

        # wave 2: steady state — counts land and fold, model frozen
        w2.write.mode("append").parquet(raw)
        _run(spark, raw, zone, ckpt, prefix)
        meta = _read_model_meta(zone, BPE_MODEL_DIR)
        assert meta["gen"] == 0 and meta["fit_epoch"] == 0
        assert _counts_key(
            read_bpe_word_counts(spark, tables["bpe_word_counts"], zone)
        ) == _counts_key(_words_of(base))

        # wave 3: fragmentation drift — refit gen 1 from folded counts
        w3.write.mode("append").parquet(raw)
        _run(spark, raw, zone, ckpt, prefix)
        assert _read_model_meta(zone, BPE_MODEL_DIR)["gen"] == 1
        merges1, vocab1 = read_bpe_model(spark, zone)
        all_docs = base.unionByName(w3)
        want_m1, want_v1 = text.bpe_learn_merges_from_words(
            _words_of(all_docs), str(tmp_path / "b1"), n_merges=8,
            return_vocab=True,
        )
        assert _merge_key(merges1) == _merge_key(want_m1)
        assert _vocab_key(vocab1) == _vocab_key(want_v1)
        folded = _counts_key(
            read_bpe_word_counts(spark, tables["bpe_word_counts"], zone)
        )
        assert folded == _counts_key(_words_of(all_docs))

        # replay: no-op (model gen, meta, and folded counts unchanged)
        _run(spark, raw, zone, ckpt, prefix)
        assert _read_model_meta(zone, BPE_MODEL_DIR)["gen"] == 1
        assert _merge_key(read_bpe_model(spark, zone)[0]) == _merge_key(
            want_m1
        )
        assert _counts_key(
            read_bpe_word_counts(spark, tables["bpe_word_counts"], zone)
        ) == folded

        # compaction: three count epochs fold to ONE pre-summed epoch,
        # reader-identical
        assert len(committed_epochs(zone, "bpe_word_counts")) == 3
        compact_bpe_word_counts(
            spark, tables["bpe_word_counts"], zone, n_buckets=4
        )
        assert len(committed_epochs(zone, "bpe_word_counts")) == 1
        assert _counts_key(
            read_bpe_word_counts(spark, tables["bpe_word_counts"], zone)
        ) == folded
    finally:
        for t in tables.values():
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_bpe_reader_none_before_any_model(spark, tmp_path):
    """read_bpe_model over a zone with no landed model returns None
    (the reader never guesses a generation)."""
    assert read_bpe_model(spark, str(tmp_path / "z")) is None
