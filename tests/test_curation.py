"""Curation-operator unit tests: the chunk-dedup pair (text-keyed
window vs md5-keyed 100 TB variant) must agree bit-for-bit, including
under the skew the hashed variant exists to absorb (one chunk present
in every document)."""

from __future__ import annotations

from real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
    curation,
)


def docs_df(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", "src", len(t)) for i, t in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def _rows(df):
    return {
        r["doc_id"]: (r["n_chunks"], r["n_kept"], r["kept_text"])
        for r in df.collect()
    }


def test_chunk_dedup_variants_agree(spark):
    corpus = docs_df(
        spark,
        [
            "alpha beta gamma delta epsilon zeta eta theta",   # 2 chunks
            "alpha beta gamma delta iota kappa",               # chunk 0 dups doc 0
            "epsilon zeta eta theta mu nu xi omicron pi",      # chunk 0 dups doc0 chunk1
            "unique words only here nothing shared at all",
            "alpha beta gamma delta",                          # fully duplicated
        ],
    )
    a = _rows(curation.chunk_dedup(corpus, chunk_tokens=4))
    b = _rows(curation.chunk_dedup_hashed(corpus, chunk_tokens=4))
    assert a == b
    # doc 4 is entirely made of already-seen chunks → NULL kept_text
    assert a[4] == (1, 0, None)
    # doc 0 wins all its chunks (earliest doc)
    assert a[0][1] == a[0][0]


def test_chunk_dedup_within_doc_repeat(spark):
    # a chunk repeated INSIDE one doc dedups to its first position
    corpus = docs_df(spark, ["a b c d a b c d e f g h"])
    a = _rows(curation.chunk_dedup(corpus, chunk_tokens=4))
    b = _rows(curation.chunk_dedup_hashed(corpus, chunk_tokens=4))
    assert a == b
    assert a[0] == (3, 2, "a b c d e f g h")


def test_chunk_dedup_hashed_ubiquitous_chunk_skew(spark):
    # one chunk appears in EVERY doc — the text-keyed window piles all
    # occurrences into a single partition; the hashed variant's map-side
    # combine absorbs it. Outputs must still agree exactly.
    hot = "the same boilerplate line"
    n = 200
    corpus = docs_df(
        spark,
        [f"{hot} unique tail {i} alpha beta row{i}" for i in range(n)],
    )
    a = _rows(curation.chunk_dedup(corpus, chunk_tokens=5))
    b = _rows(curation.chunk_dedup_hashed(corpus, chunk_tokens=5))
    assert a == b
    # the hot 5-token chunk survives only in doc 0
    assert a[0][1] == a[0][0]
    assert all(v[1] == v[0] - 1 for k, v in a.items() if k > 0)


def test_pii_redaction_covers_all_five_types(spark):
    # emails, IPv4, phones, SSNs, card numbers all counted
    # (pre-rewrite) and redacted; the SSN 3-2-4 shape must not be
    # half-eaten by the phone pattern, and the SSN pattern must not
    # anchor inside a 4-4-4-4 card number
    corpus = docs_df(
        spark,
        [
            "mail a.b@x.io or 1.2.3.4 then +1-555-12345 and 123-45-6789 done",
            "no pii here at all",
            "pay 4111-1111-1111-1234 thanks",
        ],
    )
    rows = {r["doc_id"]: r for r in curation.redact_pii(corpus).collect()}
    r = rows[0]
    assert (r["n_email"], r["n_ipv4"], r["n_phone"], r["n_ssn"]) == (1, 1, 1, 1)
    assert r["n_ccard"] == 0
    assert r["redacted_text"] == (
        "mail <EMAIL> or <IP> then <PHONE> and <SSN> done"
    )
    z = rows[1]
    assert (z["n_email"], z["n_ipv4"], z["n_phone"], z["n_ssn"], z["n_ccard"]) == (
        0, 0, 0, 0, 0,
    )
    assert z["redacted_text"] == "no pii here at all"
    c = rows[2]
    assert (c["n_ccard"], c["n_ssn"]) == (1, 0)  # no SSN inside the card
    assert c["redacted_text"] == "pay <CC> thanks"


def test_chunk_dedup_hashed_plan_has_no_window(spark):
    # the 100 TB variant must not contain a Window operator — its dedup
    # is a hash aggregation (map-side combinable); the text-keyed
    # variant does use one. Mechanical guard against regressing the
    # shuffle shape.
    corpus = docs_df(spark, ["a b c d e f g h", "a b c d x y z w"])
    hashed_plan = (
        curation.chunk_dedup_hashed(corpus)
        ._jdf.queryExecution().executedPlan().toString()
    )
    window_plan = (
        curation.chunk_dedup(corpus)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" not in hashed_plan
    assert "Window" in window_plan


def test_chunk_documents_window_invariants(spark):
    """Sliding-window chunking boundary law: every token is covered,
    the last window starts at the final stride position that still
    adds a new token (no empty trailing chunk), and a doc shorter
    than one window yields exactly one chunk."""
    from real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators.curation import (
        chunk_documents,
    )

    def doc(i, n):
        return (i, " ".join(f"t{j}" for j in range(n)))

    # n tokens around the stride boundaries for chunk=8, overlap=2
    docs = spark.createDataFrame(
        [doc(0, 3), doc(1, 8), doc(2, 9), doc(3, 14), doc(4, 15), doc(5, 20)],
        "doc_id long, text string",
    )
    rows = chunk_documents(docs, chunk_tokens=8, overlap=2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    n_by_doc = {0: 3, 1: 8, 2: 9, 3: 14, 4: 15, 5: 20}
    for d, chunks in by_doc.items():
        n = n_by_doc[d]
        chunks.sort(key=lambda r: r["chunk_index"])
        # expected window count: 1 + ceil(max(0, n - 8) / 6)
        import math

        assert len(chunks) == 1 + math.ceil(max(0, n - 8) / 6), (d, n)
        # windows advance by the stride and every token is covered
        for i, c in enumerate(chunks):
            assert c["start_token"] == i * 6
            assert c["n_tokens"] == min(8, n - c["start_token"])
        last = chunks[-1]
        assert last["start_token"] + last["n_tokens"] == n  # full coverage
        assert last["n_tokens"] > 0  # never an empty trailing chunk
    # one-chunk short doc
    assert len(by_doc[0]) == 1 and by_doc[0][0]["n_tokens"] == 3


def test_dsir_ranks_target_like_docs_first_and_broadcasts_models(spark):
    """DSIR importance weights: docs sharing the target slice's
    hashed n-grams outrank docs that don't; both model joins are
    broadcasts (model tables are <= n_buckets rows BY CONSTRUCTION —
    the bounded-build-side rule that lets this operator broadcast
    where the raw-vocab LM must shuffle)."""
    from real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        curation,
    )

    docs = spark.createDataFrame(
        [
            (1, "cat sat on the mat"),
            (2, "cat ate the fish"),
            (3, "stock market index fell"),
            (4, "bond yields rose sharply"),
            (5, "cat sat on the fish"),  # target-like n-grams, novel doc
        ],
        "doc_id long, text string",
    )
    target = docs.filter("doc_id <= 2")  # cat-world target
    out = curation.dsir_importance_weights(
        docs, target, n_buckets=256, k=2
    )
    rows = {r["doc_id"]: r for r in out.collect()}
    assert len(rows) == 5
    cat_scores = [rows[i]["log_importance"] for i in (1, 2, 5)]
    fin_scores = [rows[i]["log_importance"] for i in (3, 4)]
    assert min(cat_scores) > max(fin_scores)
    assert {i for i, r in rows.items() if r["selected"]} == {
        r["doc_id"]
        for r in sorted(
            rows.values(), key=lambda r: (-r["log_importance"], r["doc_id"])
        )[:2]
    }
    plan = out._jdf.queryExecution().executedPlan().toString()
    # both MODEL joins broadcast (bucket-keyed); the only non-broadcast
    # join allowed is global_rank's payload join-back on the unique
    # (score, id) key tuple — never a join keyed on the model side
    assert plan.count("BroadcastHashJoin") >= 2
    import re

    for m in re.finditer(r"(SortMergeJoin|ShuffledHashJoin) \[([^\]]*)\]", plan):
        assert "bucket" not in m.group(2), plan


def test_ngram_novelty_counts_self_repeats_and_cross_doc_dups(spark):
    """Semantics pin: a 5-gram occurrence is 'duplicated' when the
    corpus-wide count (self-repeats included) is >= 2; short docs
    (< n tokens) produce no row."""
    from real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        text as text_ops,
    )

    docs = spark.createDataFrame(
        [
            (1, "a b c d e x y z w v"),       # 5-gram 'a b c d e' shared w/ 2
            (2, "a b c d e q r s t u"),
            (3, "m m m m m m m m m m"),       # 6 identical self-repeat 5-grams
            (4, "unique tokens only here now five six"),
            (5, "too short"),                  # < 5 tokens -> no row
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in text_ops.ngram_novelty(docs, n=5, threshold=0.5).collect()
    }
    assert set(rows) == {1, 2, 3, 4}
    # docs 1/2: 6 5-grams each, exactly one shared -> 1/6 duplicated
    for d in (1, 2):
        assert rows[d]["n_ngrams"] == 6 and rows[d]["n_duplicated"] == 1
        assert not rows[d]["memorization_risk"]
    # doc 3: all six occurrences are the same 5-gram -> all duplicated
    assert rows[3]["n_duplicated"] == rows[3]["n_ngrams"] == 6
    assert rows[3]["memorization_risk"]
    assert rows[4]["n_duplicated"] == 0 and not rows[4]["memorization_risk"]


def test_curation_funnel_state_path_matches_plan_pure(spark, tmp_path):
    """curation_funnel(shingle_state=...) — the state seam — produces
    the identical funnel as the plan-pure path, with zero extra
    corpus scans for the novelty signal (the state table replaces the
    shingle aggregation)."""
    import re

    from real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.functions.core import (
        md5_long,
    )
    from real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators.text import (
        tokens,
    )
    from pyspark.sql import functions as F

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    # build the (doc_id, _h, _tf) state exactly as the streaming twin
    # maintains it, snapshot it to parquet (the zone form)
    n = 5
    t = tokens(F.lower(F.col("text")))
    sz = F.size(t)
    sh = t
    for j in range(1, n):
        shifted = F.slice(t, j + 1, F.greatest(sz - j, F.lit(0)))
        sh = F.zip_with(sh, shifted, lambda a, b: F.concat_ws(" ", a, b))
    full = F.slice(sh, 1, F.greatest(sz - (n - 1), F.lit(0)))
    state_path = str(tmp_path / "shingle_state")
    (
        docs.select("doc_id", t.alias("_t"), full.alias("_sh"))
        .filter(F.size("_t") >= n)
        .select("doc_id", F.explode("_sh").alias("_sgl"))
        .select("doc_id", md5_long(F.col("_sgl")).alias("_h"))
        .groupBy("doc_id", "_h")
        .agg(F.count(F.lit(1)).alias("_tf"))
        .write.parquet(state_path)
    )
    state = spark.read.parquet(state_path)
    from_state = curation.curation_funnel(docs, shingle_state=state)
    plan_pure = curation.curation_funnel(docs)
    key = lambda df: sorted(tuple(r) for r in df.collect())
    assert key(from_state) == key(plan_pure)
    final = (
        from_state._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )
    doc_scans = re.findall(r"FileScan parquet[^\n]*documents", final)
    assert len(doc_scans) == 1, final  # quality+fp scan only


def test_curation_funnel_keeper_among_quality_survivors(spark):
    """ADVICE r7: the exact-dedup keeper is chosen AMONG QUALITY
    SURVIVORS (quality-then-dedup), not corpus-wide. Docs 1 and 2
    share a normalized fingerprint ('a b'); doc 1 (min id) fails the
    quality gate (3 chars -> len_factor ~0), doc 2 passes (500+ chars
    of padding whitespace -> len_factor 1.0, score 2/3). Corpus-wide
    min-id keeper would drop the whole group at exact_dedup; the
    survivor-scoped keeper keeps doc 2."""
    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a" + " " * 500 + "b")],
        "doc_id long, text string",
    )
    rows = {
        r["stage"]: r
        for r in curation.curation_funnel(docs, quality_threshold=0.5).collect()
    }
    assert rows["ingested"]["docs"] == 2
    assert rows["quality"]["docs"] == 1
    assert rows["exact_dedup"]["docs"] == 1  # doc 2 is the keeper
    assert rows["ngram_novel"]["docs"] == 1
