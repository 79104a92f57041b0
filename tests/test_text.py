

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
