

def test_rouge2_pairs_identities(spark):
    """ROUGE-2 pins: identical texts → F1 = 1.0; disjoint → 0; the
    CLIPPED multiset rule (repeated bigram on one side counts only up
    to the other side's multiplicity); under-2-token texts emit a row
    with zero totals and NULL F1."""
    from etl_capnz_spark.operators.text import rouge2_pairs

    rows = [
        (1, "the cat sat on the mat", 2, "the cat sat on the mat"),
        (3, "alpha beta gamma", 4, "delta epsilon zeta"),
        # 'a b' appears twice left, once right -> clipped overlap 1;
        # totals 3 and 1 -> F1 = 2*1/4 = 0.5
        (5, "a b a b", 6, "a b"),
        (7, "single", 8, "x y z"),
    ]
    df = spark.createDataFrame(
        rows, "ia long, ta string, ib long, tb string"
    )
    got = {r["id_a"]: r for r in
           rouge2_pairs(df, "ia", "ta", "ib", "tb").collect()}
    assert got[1]["rouge2_f1"] == 1.0
    assert got[1]["overlap"] == got[1]["total_a"] == 5
    assert got[3]["overlap"] == 0 and got[3]["rouge2_f1"] == 0.0
    assert got[5]["overlap"] == 1 and got[5]["rouge2_f1"] == 0.5
    assert got[7]["total_a"] == 0 and got[7]["overlap"] == 0
    assert got[7]["rouge2_f1"] == 2.0 / 2.0 * 0 or got[7]["rouge2_f1"] == 0.0


def test_ngram_novelty_planted_copy_and_partial_overlap(spark):
    """An exact copy scores 0; the original scores 1; a doc sharing
    one leading trigram with an earlier doc scores 3/4; a 2-token doc
    emits (0, 0, NULL) — undefined, not 1.0."""
    from etl_capnz_spark.operators.text import ngram_novelty

    docs = spark.createDataFrame(
        [
            (1, "a b c d e"),
            (2, "a b c d e"),
            (3, "a b c x y z"),
            (4, "too short"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r
        for r in ngram_novelty(docs, "text", "doc_id", n=3).collect()
    }
    assert len(got) == 4
    assert got[1]["n_grams"] == 3 and got[1]["novelty"] == 1.0
    assert got[2]["n_grams"] == 3 and got[2]["novelty"] == 0.0
    # doc 3 trigrams: "a b c" (seen in doc 1), "b c x", "c x y",
    # "x y z" → 3 of 4 novel
    assert got[3]["n_grams"] == 4 and got[3]["novelty"] == 0.75
    assert got[4]["n_grams"] == 0 and got[4]["n_novel"] == 0
    assert got[4]["novelty"] is None


def test_ngram_novelty_tie_credits_earliest_and_distinct_grams(spark):
    """Two docs introducing the same gram: only the LOWER id is
    credited (first-occurrence discipline); repeated grams inside one
    doc count ONCE (distinct-gram contract); partition-invariant."""
    from etl_capnz_spark.operators.text import ngram_novelty

    docs = spark.createDataFrame(
        [
            (10, "p q r p q r p q r"),
            (20, "p q r s t u"),
        ],
        "doc_id long, text string",
    )
    res = ngram_novelty(docs, "text", "doc_id", n=3)
    got = {r["doc_id"]: r for r in res.collect()}
    # doc 10 has 7 positional trigrams but only 3 DISTINCT
    # ("p q r", "q r p", "r p q"), all novel
    assert got[10]["n_grams"] == 3 and got[10]["novelty"] == 1.0
    # doc 20: "p q r" (tie → credited to doc 10), "q r s", "r s t",
    # "s t u" → 3/4
    assert got[20]["n_grams"] == 4 and got[20]["novelty"] == 0.75

    got2 = {
        r["doc_id"]: r
        for r in ngram_novelty(
            docs.repartition(8), "text", "doc_id", n=3
        ).collect()
    }
    assert got2 == got


def test_curation_gate_reasons_and_precedence(spark):
    """Each drop_reason branch fires on a planted doc; the CASE chain
    is first-failing (a doc failing several checks reports the
    earliest); a clean English doc keeps."""
    from pyspark.sql import functions as F

    from etl_capnz_spark.operators.text import (
        detect_language,
        pii_counts,
        quality_metrics,
    )

    rows = [
        (1, "the of and is a quick brown fox jumps here"),  # keep (en)
        (2, "one two"),                                      # too_short
        (3, "the of and is !!! ??? ... ;;; ::: ++ ** (())"),  # punct
        (4, "the of and is 11111 22222 3333 4444 5555"),      # digits
        (5, "le la et les des un une dans pour est sur"),     # lang (fr)
        (6, "the of and is contact someone me@example.com now ok"),  # pii
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    q = quality_metrics(docs, "text")
    n_email, n_number = pii_counts(F.col("text"))
    scored = q.select(
        "doc_id",
        detect_language(F.col("text")).alias("lang_guess"),
        "n_tokens", "punct_ratio", "digit_ratio", "mean_token_len",
        n_email.alias("n_emails"), n_number.alias("n_numbers"),
    )
    reason = (
        F.when(F.col("n_tokens") < 5, "too_short")
        .when(F.col("punct_ratio") >= 0.3, "punct")
        .when(F.col("digit_ratio") >= 0.3, "digits")
        .when(
            (F.col("mean_token_len") < 2)
            | (F.col("mean_token_len") > 12),
            "token_len",
        )
        .when(~F.col("lang_guess").eqNullSafe(F.lit("en")), "lang")
        .when(F.col("n_emails") + F.col("n_numbers") > 0, "pii")
    )
    got = {
        r["doc_id"]: r
        for r in scored.withColumn("drop_reason", reason)
        .withColumn("keep", F.col("drop_reason").isNull())
        .collect()
    }
    assert got[1]["keep"] is True and got[1]["drop_reason"] is None
    assert got[2]["drop_reason"] == "too_short"
    assert got[3]["drop_reason"] == "punct"
    assert got[4]["drop_reason"] == "digits"
    assert got[5]["drop_reason"] == "lang"
    assert got[6]["drop_reason"] == "pii" and got[6]["n_emails"] == 1
    # precedence: doc 2 is ALSO not-English-scoring, but too_short
    # fires first (first-failing-check contract)


def test_vocab_coverage_hand_case(spark):
    """Known corpus: vocab = top-2 tokens by (count desc, token asc);
    per-doc occurrence and type OOV counts are hand-checkable, empty
    docs emit no row."""
    from etl_capnz_spark.operators.text import vocab_coverage

    rows = [
        (1, "a a a b b c"),   # a:3 b:2 c:1
        (2, "b b a z z z"),   # z:3 here -> global z:3
        (3, "   "),           # tokenless: no output row
    ]
    # global counts: a:4, b:4, z:3, c:1 -> top-2 = {a, b}
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {
        r["doc_id"]: r
        for r in vocab_coverage(df, "text", "doc_id", top_n=2).collect()
    }
    assert set(got) == {1, 2}
    d1 = got[1]
    assert d1["n_tokens"] == 6 and d1["n_oov"] == 1  # the lone c
    assert d1["n_types"] == 3 and d1["n_oov_types"] == 1
    assert d1["oov_rate"] == round(1 / 6, 6)
    d2 = got[2]
    assert d2["n_tokens"] == 6 and d2["n_oov"] == 3  # the three z
    assert d2["n_types"] == 3 and d2["n_oov_types"] == 1
    assert d2["oov_rate"] == 0.5
