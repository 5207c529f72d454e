"""duplicate_span_removal — exact-substring dedup at span grain
(Lee et al. 2022 ExactSubstr, token-5-gram flavor).

Hand-constructed corpus pins the semantics: cross-doc shared blocks
vanish from BOTH docs while unique tokens survive, coverage is the
union of duplicated 5-gram windows (maximal spans, counted), dup
detection is case-INsensitive while the emitted text keeps original
case, intra-doc repeats count as duplicates, and sub-5-token docs are
untouched.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
    text,
)


def _run(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = text.duplicate_span_removal(df, n=5, min_count=2)
    return {r.doc_id: r for r in out.collect()}


def test_shared_blocks_removed_unique_tokens_survive(spark):
    rows = [
        (1, "alpha beta gamma delta epsilon zeta UNIQUE1 "
            "one two three four five END1"),
        (2, "Alpha BETA gamma delta epsilon zeta UNIQUE2 "
            "one two three four five END2"),
        (3, "totally unique text with no duplicated grams at all"),
        (4, "tiny doc"),
    ]
    got = _run(spark, rows)
    # doc 1: positions 0-5 (two overlapping dup grams merge into one
    # span) and 7-11 (the shared 5-gram) go; UNIQUE1 and END1 stay
    assert got[1].clean_text == "UNIQUE1 END1"
    assert got[1].n_tokens == 13
    assert got[1].n_removed == 11
    assert got[1].n_spans == 2
    # doc 2: dup detection is case-insensitive, output keeps case
    assert got[2].clean_text == "UNIQUE2 END2"
    assert got[2].n_spans == 2
    # doc 3: untouched, text round-trips whitespace-normalized
    assert got[3].n_removed == 0
    assert got[3].n_spans == 0
    assert got[3].clean_text == rows[2][1]
    # doc 4: < 5 tokens, no grams, untouched
    assert got[4].n_removed == 0
    assert got[4].clean_text == "tiny doc"


def test_intra_doc_repeat_counts_as_duplicate(spark):
    got = _run(
        spark,
        [(7, "x1 x2 x3 x4 x5 filler x1 x2 x3 x4 x5 tail")],
    )
    r = got[7]
    assert r.clean_text == "filler tail"
    assert r.n_removed == 10
    assert r.n_spans == 2


def test_fully_duplicated_doc_empties(spark):
    got = _run(
        spark,
        [
            (10, "same five tokens exactly here"),
            (11, "same five tokens exactly here"),
        ],
    )
    for d in (10, 11):
        assert got[d].clean_text == ""
        assert got[d].n_removed == 5
        assert got[d].n_tokens == 5
        assert got[d].n_spans == 1


def test_decontaminate_spans_removes_probe_grams_only(spark):
    """A probe 5-gram is stripped wherever it appears (any position,
    any case); text without a probe match round-trips."""
    rows = [
        (1, "the SECRET eval answer is here inside a long document"),
        (2, "prefix words then the secret EVAL answer is trailing"),
        (3, "completely unrelated prose that matches no probe at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    probes = spark.createDataFrame(
        [("the secret eval answer is",)], "probe string"
    )
    got = {
        r.doc_id: r
        for r in text.decontaminate_spans(df, probes, n=5).collect()
    }
    # doc 1: positions 0-4 covered
    assert got[1].clean_text == "here inside a long document"
    assert got[1].n_removed == 5 and got[1].n_spans == 1
    # doc 2: the probe sits at positions 3-7, case-insensitively
    assert got[2].clean_text == "prefix words then trailing"
    assert got[2].n_removed == 5 and got[2].n_spans == 1
    # doc 3: untouched
    assert got[3].n_removed == 0
    assert got[3].clean_text == rows[2][1]


def test_decontaminate_shuffle_fallback_is_identical(spark):
    """Past ``broadcast_max_probes`` the probe join runs as a shuffle
    string equi-join (the measured size gate, VERDICT r14 #5) — same
    key, same semantics, so the result must be row-identical to the
    broadcast path on the real corpus."""
    from real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        curation,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    probes = curation.contamination_probes(
        docs, every=50, probe_tokens=5
    ).select("probe")
    bcast = text.decontaminate_spans(docs, probes, n=5)
    shuffled = text.decontaminate_spans(
        docs, probes, n=5, broadcast_max_probes=0
    )
    assert sorted(map(tuple, bcast.collect())) == sorted(
        map(tuple, shuffled.collect())
    )
    # NOTE: past the cap only the HINT is dropped — Catalyst may still
    # pick a stats-based broadcast under the autoBroadcast threshold
    # (bounded by config, so never the OOM the cap guards against);
    # the contract here is value identity, not a forced join strategy.


def test_accounting_consistency_on_testdata(spark):
    """n_removed + len(clean tokens) == n_tokens on the real corpus,
    and spans only exist where removal happened."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = text.duplicate_span_removal(docs)
    kept_len = F.when(
        F.col("clean_text") == "", F.lit(0)
    ).otherwise(F.size(F.split(F.col("clean_text"), r"\s+")))
    bad = out.filter(
        (F.col("n_removed") + kept_len != F.col("n_tokens"))
        | ((F.col("n_spans") > 0) != (F.col("n_removed") > 0))
    )
    assert bad.count() == 0


def test_decontaminate_probe_count_memoized(spark, monkeypatch):
    """ADVICE r15: the broadcast-gate count job runs at most ONCE per
    probes DataFrame (memoized by identity) — a per-micro-batch
    caller with a static probe table pays it on the first batch only;
    an explicit probe_count makes the operator fully lazy (zero count
    jobs at construction)."""
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta")],
        "doc_id long, text string",
    )
    probes = spark.createDataFrame(
        [("alpha beta gamma delta epsilon",)], "probe string"
    )
    # patch the CONCRETE DataFrame class (pyspark 4: pyspark.sql
    # .DataFrame is the abstract base; classic overrides count)
    cls = type(probes)
    calls = {"n": 0}
    orig = cls.count

    def counting(self):
        calls["n"] += 1
        return orig(self)

    monkeypatch.setattr(cls, "count", counting)
    text.decontaminate_spans(docs, probes).collect()
    first = calls["n"]
    assert first >= 1  # the gate counted once
    text.decontaminate_spans(docs, probes).collect()
    assert calls["n"] == first, "second call re-ran the gate count"
    calls["n"] = 0
    text.decontaminate_spans(
        spark.createDataFrame(
            [(2, "eta theta iota")], "doc_id long, text string"
        ),
        spark.createDataFrame([("x y z q w",)], "probe string"),
        probe_count=1,
    ).collect()
    assert calls["n"] == 0, "explicit probe_count still ran a job"
