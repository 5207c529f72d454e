"""Streaming Count-Min maintenance (ROADMAP r10→11 #3):
run_corpus_ingest(sketch_cms=True) folds each epoch's term counts
into the mergeable d×w cell table; the merged read is bit-exact vs
the batch sketch over the same corpus."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
    text,
)
from real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.streaming.pipeline import (
    read_cms_cells,
    run_corpus_ingest,
)

SF = "/root/testdata/sf0.001"


def _key(df):
    return sorted(tuple(r) for r in df.collect())


def test_streamed_cms_cells_match_batch_sketch(spark, tmp_path):
    """Two delivery waves -> two cms_cells epochs; the reader's
    groupBy-sum equals the batch cell table over the full corpus
    (cells are integer sums - merge order cannot matter), and a
    replayed run is a no-op."""
    raw, zone, ckpt = (
        str(tmp_path / d) for d in ("raw", "zone", "ckpt")
    )
    prefix = "t_cms_ing_"
    tables = {}
    try:
        base = (
            spark.read.parquet(f"{SF}/documents.parquet")
            .select("doc_id", "text")
            .limit(60)
        )
        for m in range(2):
            base.filter(F.col("doc_id") % 2 == m).write.mode(
                "append"
            ).parquet(raw)
            tables = run_corpus_ingest(
                spark, raw, zone, ckpt,
                state_refresh=True, sketch_cms=True,
                n_buckets=4, table_prefix=prefix,
            )
        got = _key(read_cms_cells(spark, tables["cms_cells"], zone))

        exact = (
            base.select(
                F.explode(
                    text.tokens(F.lower(F.col("text")))
                ).alias("term")
            )
            .groupBy("term")
            .agg(F.count(F.lit(1)).cast("long").alias("n_true"))
        )
        want = _key(text.cms_cells_from_term_counts(exact))
        assert got == want and len(got) > 0

        # replay: nothing new, cells unchanged
        run_corpus_ingest(
            spark, raw, zone, ckpt,
            state_refresh=True, sketch_cms=True,
            n_buckets=4, table_prefix=prefix,
        )
        assert _key(
            read_cms_cells(spark, tables["cms_cells"], zone)
        ) == want
    finally:
        for t in tables.values():
            spark.sql(f"DROP TABLE IF EXISTS {t}")


@pytest.mark.slow
def test_cms_cells_compaction_folds_epochs(spark, tmp_path):
    """VERDICT r10 #8: compact_cms_cells folds the accumulated cell
    epochs into ONE pre-summed epoch — read_cms_cells returns the
    bit-identical merged sketch before and after, the on-disk zone
    drops to a single epoch of ≤ d×w rows, and a post-compaction
    ingest wave lands above the fold and keeps merging correctly."""
    import os

    from real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.streaming.pipeline import (
        _table_location,
        compact_cms_cells,
        committed_epochs,
    )

    raw, zone, ckpt = (
        str(tmp_path / d) for d in ("raw", "zone", "ckpt")
    )
    prefix = "t_cms_cmp_"
    tables = {}
    try:
        base = (
            spark.read.parquet(f"{SF}/documents.parquet")
            .select("doc_id", "text")
            .limit(60)
        )
        # three delivery waves -> three cell epochs
        for m in range(3):
            base.filter(F.col("doc_id") % 3 == m).write.mode(
                "append"
            ).parquet(raw)
            tables = run_corpus_ingest(
                spark, raw, zone, ckpt,
                state_refresh=True, sketch_cms=True,
                n_buckets=4, table_prefix=prefix,
            )
        assert len(committed_epochs(zone, "cms_cells")) == 3
        before = _key(read_cms_cells(spark, tables["cms_cells"], zone))

        compact_cms_cells(spark, tables["cms_cells"], zone, n_buckets=4)

        # one committed epoch, physically pre-summed (row count == the
        # merged cell count), reader bit-identical
        assert len(committed_epochs(zone, "cms_cells")) == 1
        loc = _table_location(spark, tables["cms_cells"])
        on_disk = [
            d for d in os.listdir(loc) if d.startswith("_epoch=")
        ]
        assert len(on_disk) == 1
        raw_rows = spark.table(tables["cms_cells"]).count()
        assert raw_rows == len(before)
        assert (
            _key(read_cms_cells(spark, tables["cms_cells"], zone))
            == before
        )

        # a fourth wave lands ABOVE the folded epoch and merges in:
        # the total equals the batch sketch over (waves 1-3) x 2
        base.write.mode("append").parquet(raw)
        run_corpus_ingest(
            spark, raw, zone, ckpt,
            state_refresh=True, sketch_cms=True,
            n_buckets=4, table_prefix=prefix,
        )
        doubled = _key(
            read_cms_cells(spark, tables["cms_cells"], zone)
        )
        assert doubled == [
            (r, c, 2 * v) for (r, c, v) in before
        ]
    finally:
        for t in tables.values():
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_sketch_cms_requires_state_refresh(spark, tmp_path):
    with pytest.raises(ValueError, match="state_refresh"):
        run_corpus_ingest(
            spark,
            str(tmp_path / "raw"),
            str(tmp_path / "zone"),
            str(tmp_path / "ckpt"),
            sketch_cms=True,
        )
    with pytest.raises(ValueError, match="state_refresh"):
        run_corpus_ingest(
            spark,
            str(tmp_path / "raw"),
            str(tmp_path / "zone"),
            str(tmp_path / "ckpt"),
            sketch_hll=True,
        )


def test_streamed_hll_registers_match_batch_and_compact(spark, tmp_path):
    """The max-merge twin of the CMS case: two delivery waves -> two
    register epochs; the reader's groupBy-max equals the batch
    register table over the full corpus (max is associative,
    commutative, and IDEMPOTENT — so a third wave REDELIVERING wave 1
    verbatim leaves the merged sketch unchanged), and compaction folds
    the zone to one pre-maxed epoch with an identical read."""
    import os

    from real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.streaming.pipeline import (
        _table_location,
        compact_hll_registers,
        committed_epochs,
        read_hll_registers,
    )

    raw, zone, ckpt = (
        str(tmp_path / d) for d in ("raw", "zone", "ckpt")
    )
    prefix = "t_hll_ing_"
    tables = {}
    try:
        base = (
            spark.read.parquet(f"{SF}/documents.parquet")
            .select("doc_id", "text")
            .limit(60)
        )
        w1 = base.filter(F.col("doc_id") % 2 == 0)
        for wave in (w1, base.filter(F.col("doc_id") % 2 == 1), w1):
            wave.write.mode("append").parquet(raw)
            tables = run_corpus_ingest(
                spark, raw, zone, ckpt,
                state_refresh=True, sketch_hll=True,
                n_buckets=4, table_prefix=prefix,
            )
        got = _key(read_hll_registers(spark, tables["hll_registers"], zone))
        want = _key(
            text.hll_registers_from_terms(
                base.select(
                    F.explode(
                        text.tokens(F.lower(F.col("text")))
                    ).alias("term")
                )
            )
        )
        # wave 3 re-delivered wave 1's docs: idempotent max — merged
        # registers still equal the batch build over waves 1+2
        assert got == want and len(got) > 0
        assert len(committed_epochs(zone, "hll_registers")) == 3

        compact_hll_registers(
            spark, tables["hll_registers"], zone, n_buckets=4
        )
        assert len(committed_epochs(zone, "hll_registers")) == 1
        loc = _table_location(spark, tables["hll_registers"])
        assert len(
            [d for d in os.listdir(loc) if d.startswith("_epoch=")]
        ) == 1
        assert spark.table(tables["hll_registers"]).count() == len(got)
        assert (
            _key(read_hll_registers(spark, tables["hll_registers"], zone))
            == got
        )
    finally:
        for t in tables.values():
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_streamed_price_histogram_matches_batch_and_compacts(
    spark, tmp_path
):
    """The exact-quantile tier's streaming state (VERDICT r11 #4):
    two delivery waves -> two price_hist epochs; the reader's
    groupBy-sum equals the batch cents histogram over all rows
    (integer counts over integer cents — exact, not a sketch), the
    quartiles served from the folded state equal the batch operator,
    a replayed run is a no-op, and compaction folds the epochs to ONE
    pre-summed epoch, reader-identical."""
    from real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators.olap_deep import (
        price_histogram,
        price_quantiles,
        price_quantiles_from_histogram,
    )
    from real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.streaming.pipeline import (
        committed_epochs,
        compact_price_histogram,
        read_price_histogram,
        run_price_histogram_ingest,
    )

    raw, zone, ckpt = (str(tmp_path / d) for d in ("raw", "zone", "ckpt"))
    prefix = "t_price_ing_"
    tables = {}
    try:
        li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
            "l_orderkey", "l_linestatus", "l_extendedprice"
        )
        for m in range(2):
            li.filter(F.col("l_orderkey") % 2 == m).select(
                "l_linestatus", "l_extendedprice"
            ).write.mode("append").parquet(raw)
            tables = run_price_histogram_ingest(
                spark, raw, zone, ckpt, n_buckets=4,
                table_prefix=prefix,
            )
        folded = read_price_histogram(
            spark, tables["price_hist"], zone
        )
        want_hist = _key(price_histogram(li))
        assert _key(folded) == want_hist
        assert _key(price_quantiles_from_histogram(folded)) == _key(
            price_quantiles(li)
        )

        # replay: no-op (still two epochs, same fold)
        run_price_histogram_ingest(
            spark, raw, zone, ckpt, n_buckets=4, table_prefix=prefix,
        )
        assert len(committed_epochs(zone, "price_hist")) == 2
        assert _key(
            read_price_histogram(spark, tables["price_hist"], zone)
        ) == want_hist

        # compaction: fold to ONE pre-summed epoch, reader-identical
        compact_price_histogram(
            spark, tables["price_hist"], zone, n_buckets=4
        )
        assert len(committed_epochs(zone, "price_hist")) == 1
        assert _key(
            read_price_histogram(spark, tables["price_hist"], zone)
        ) == want_hist
    finally:
        for t in tables.values():
            spark.sql(f"DROP TABLE IF EXISTS {t}")
