"""Heavy hitters (Misra-Gries + exact pass), Bloom pre-filter, and
line-level global dedup."""

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from etl_capnz_spark.operators.frequency import (
    _mg_fold,
    heavy_hitters_exact,
    misra_gries_candidates,
)
from etl_capnz_spark.operators.bloom import (
    bloom_might_contain,
    bloom_prefilter_new_docs,
    build_bloom,
)
from etl_capnz_spark.operators.dedup import line_dedup_global


# ---------------------------------------------------------------- MG core
def test_mg_fold_bounded_and_superset():
    """Pure-python MG: counter dict never exceeds k; every item with
    freq > n/(k+1) survives — the textbook guarantee, checked on an
    adversarial stream that interleaves heavy items with churn."""
    k = 7
    # 3 heavy items (freq 600 each > n/(k+1)=475) drowned in 2000 singletons
    stream = (["h1", "h2", "h3"] * 600) + [f"noise{i}" for i in range(2000)]
    rng = np.random.RandomState(0)
    rng.shuffle(stream)
    counters = {}
    for start in range(0, len(stream), 97):  # ragged batches
        batch = pd.Series(stream[start : start + 97]).value_counts()
        _mg_fold(counters, batch, k)
        assert len(counters) <= k
    n = len(stream)
    for heavy in ("h1", "h2", "h3"):
        assert 600 > n / (k + 1)
        assert heavy in counters


def test_mg_candidates_superset_and_bounded(spark):
    df = spark.createDataFrame(
        [(i, "hot" if i % 3 == 0 else f"cold{i}") for i in range(3000)],
        "id long, key string",
    ).repartition(8)
    cand = misra_gries_candidates(df, "key", k=4).toPandas()
    # ≤ k rows per partition
    assert len(cand) <= 4 * 8
    assert "hot" in set(cand["item"])


def test_heavy_hitters_exact_matches_naive(spark):
    df = spark.createDataFrame(
        [(i, int(np.sqrt(i))) for i in range(5000)], "id long, key long"
    ).repartition(8)
    k = 40  # threshold n/41 ≈ 122: keys 61-69 (count 2j+1) qualify, the rest don't
    got = {
        r["item"]: r["cnt"] for r in heavy_hitters_exact(df, "key", k).collect()
    }
    pdf = df.toPandas()
    vc = pdf["key"].value_counts()
    n = len(pdf)
    expect = {item: int(c) for item, c in vc.items() if c * (k + 1) > n}
    assert got == expect
    assert 0 < len(expect) < vc.size  # non-trivial: some in, some out


# ---------------------------------------------------------------- Bloom
def test_bloom_no_false_negatives_and_bounded_fpr(spark):
    base = spark.createDataFrame(
        [(f"member-{i}",) for i in range(2000)], "v string"
    ).repartition(6)
    bloom = build_bloom(base, "v", num_bits=1 << 16, num_hashes=4)
    assert len(bloom) == (1 << 16) // 8

    probe = spark.createDataFrame(
        [(f"member-{i}",) for i in range(2000)]
        + [(f"absent-{i}",) for i in range(2000)],
        "v string",
    )
    flags = probe.withColumn(
        "hit", bloom_might_contain(F.col("v"), bloom, 1 << 16, 4)
    ).toPandas()
    members = flags[flags["v"].str.startswith("member")]
    absents = flags[flags["v"].str.startswith("absent")]
    assert members["hit"].all()  # NO false negatives, ever
    # sized FPR ~ (1-e^{-4*2000/65536})^4 ≈ 0.018% — allow generous slack
    assert absents["hit"].mean() < 0.02


def test_bloom_merge_is_or(spark):
    a = spark.createDataFrame([(f"a{i}",) for i in range(500)], "v string")
    b = spark.createDataFrame([(f"b{i}",) for i in range(500)], "v string")
    both = a.union(b)
    f_a = np.frombuffer(build_bloom(a, "v", 1 << 14), dtype=np.uint8)
    f_b = np.frombuffer(build_bloom(b, "v", 1 << 14), dtype=np.uint8)
    f_ab = np.frombuffer(build_bloom(both, "v", 1 << 14), dtype=np.uint8)
    assert np.array_equal(np.bitwise_or(f_a, f_b), f_ab)


def test_bloom_prefilter_equals_plain_anti_join(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    base = docs.filter(F.col("doc_id") % 3 == 0)
    new = docs.filter(F.col("doc_id") % 3 != 0).unionByName(
        base.limit(20)  # plant known duplicates into the "new" batch
    )
    got = sorted(
        r["doc_id"]
        for r in bloom_prefilter_new_docs(new, base, "text", "doc_id")
        .select("doc_id")
        .collect()
    )
    plain = sorted(
        r["doc_id"]
        for r in new.join(
            base.select(F.md5("text").alias("_h")).distinct(),
            new["text"].cast("string").isNotNull()
            & (F.md5(new["text"]) == F.col("_h")),
            "left_anti",
        )
        .select("doc_id")
        .collect()
    )
    assert got == plain
    assert len(got) < new.count()  # the planted dups actually got removed


# ---------------------------------------------------------- line dedup
def test_line_dedup_global_semantics(spark):
    long_a = "This navigation bar line is long enough to dedup."
    long_b = "Another sufficiently long boilerplate license footer line."
    rows = [
        (1, f"{long_a}\nunique one\n{long_b}"),
        (2, f"{long_a}\nunique two"),
        (3, f"short\n{long_b}\nshort"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r["text"]
        for r in line_dedup_global(df, "text", "doc_id", min_chars=30).collect()
    }
    assert out[1] == f"{long_a}\nunique one\n{long_b}"  # first occurrences kept
    assert out[2] == "unique two"  # long_a removed (doc 1 owns it)
    assert out[3] == "short\nshort"  # long_b removed; short lines always kept
    assert set(out) == {1, 2, 3}  # document set preserved


def test_line_dedup_all_lines_removed_keeps_doc(spark):
    line = "a single long duplicated line that exceeds the threshold"
    df = spark.createDataFrame(
        [(1, line), (2, line)], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r["text"]
        for r in line_dedup_global(df, "text", "doc_id", min_chars=10).collect()
    }
    assert out == {1: line, 2: ""}


# ------------------------------------------------------------- count-min
def test_cms_never_underestimates_and_exact_when_wide(spark):
    from etl_capnz_spark.operators.frequency import cms_build, cms_estimate

    df = spark.createDataFrame(
        [(f"k{i % 50}",) for i in range(2000)], "v string"
    ).repartition(6)
    truth = {f"k{i}": 40 for i in range(50)}

    # narrow sketch: collisions guaranteed (50 keys into width 16) —
    # estimates may inflate but must NEVER go below the true count
    sk = cms_build(df, "v", depth=3, width=16)
    est = {
        r["item"]: r["est"]
        for r in cms_estimate(sk, df.distinct(), "v", depth=3, width=16).collect()
    }
    assert set(est) == set(truth)
    assert all(est[k] >= truth[k] for k in truth)
    assert any(est[k] > truth[k] for k in truth)  # collisions really occurred

    # wide sketch: no collisions at this scale — exact recovery
    sk2 = cms_build(df, "v", depth=4, width=4096)
    est2 = {
        r["item"]: r["est"]
        for r in cms_estimate(sk2, df.distinct(), "v", depth=4, width=4096).collect()
    }
    assert est2 == truth


def test_cms_merge_equals_build_of_union(spark):
    from etl_capnz_spark.operators.frequency import cms_build, cms_merge

    a = spark.createDataFrame([(f"a{i % 7}",) for i in range(300)], "v string")
    b = spark.createDataFrame([(f"{'a' if i % 2 else 'b'}{i % 5}",) for i in range(300)], "v string")

    def cells(df):
        return {(r["i"], r["j"]): r["cnt"] for r in df.collect()}

    merged = cells(cms_merge(cms_build(a, "v"), cms_build(b, "v")))
    union = cells(cms_build(a.union(b), "v"))
    assert merged == union


# ------------------------------------------------------- quantile twin
def test_approx_percentile_within_rank_eps_of_exact(spark, sf_dir):
    """approx_percentile (GK sketch, the unbounded-cardinality scale
    path) must land within rank-ε of the exact percentile: its answer
    for quantile q must be an actual data value whose rank is within
    ε·n of q·n (ε = 1/accuracy, default accuracy 10000 → tight here)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    approx = ev.groupBy("event_type").agg(
        F.expr("approx_percentile(value, 0.5, 1000)").alias("approx"),
        F.count("*").alias("n"),
    )
    ranked = (
        ev.join(approx, "event_type")
        .groupBy("event_type")
        .agg(
            F.first("n").alias("n"),
            F.count_if(F.col("value") <= F.col("approx")).alias(
                "rank_of_approx"
            ),
        )
        .collect()
    )
    for r in ranked:
        eps_ranks = r["n"] / 1000 + 1
        assert abs(r["rank_of_approx"] - 0.5 * r["n"]) <= eps_ranks + 1, r


# -------------------------------------------------------- guard rails
def test_parameter_guards(spark):
    from etl_capnz_spark.operators.frequency import cms_build
    from etl_capnz_spark.operators.layout import quantize_minmax

    df = spark.createDataFrame([("a",)], "v string")
    with pytest.raises(ValueError):
        heavy_hitters_exact(df, "v", 0)
    with pytest.raises(ValueError):
        cms_build(df, "v", depth=0)
    with pytest.raises(ValueError):
        build_bloom(df, "v", num_bits=12)  # not a multiple of 8
    with pytest.raises(ValueError):
        build_bloom(df, "v", num_hashes=0)
    with pytest.raises(ValueError):
        quantize_minmax(F.col("v"), 5.0, 5.0)
    with pytest.raises(ValueError):
        quantize_minmax(F.col("v"), 0.0, 1.0, bits=20)


def test_build_bloom_empty_input(spark):
    empty = spark.createDataFrame([], "v string")
    bloom = build_bloom(empty, "v", num_bits=1 << 10)
    assert bloom == bytes((1 << 10) // 8)


# --------------------------------------------------------- winnowing
def test_winnow_shared_run_guarantee(spark):
    """The winnowing guarantee (Schleimer et al.): any shared token run
    of length >= w+1 yields >= 1 identical fingerprint hash in both
    docs; disjoint docs share none. Also pins density: selections are a
    strict subset of positions."""
    from etl_capnz_spark.operators.text import winnow_fingerprints

    shared = "the quick brown fox jumps over the lazy dog tonight"
    df = spark.createDataFrame(
        [
            (1, "alpha beta " + shared + " gamma delta"),
            (2, "omega " + shared + " psi chi phi"),
            (3, "completely different words with no overlap at all here now"),
        ],
        "doc_id long, text string",
    )
    fp = winnow_fingerprints(df, "text", "doc_id", w=4)
    by_doc: dict = {}
    n_sel = 0
    for r in fp.collect():
        by_doc.setdefault(r["doc_id"], set()).add(r["fp_hash"])
        n_sel += 1
    assert by_doc[1] & by_doc[2]  # shared >= w+1-token run detected
    assert not (by_doc[1] & by_doc[3])
    assert not (by_doc[2] & by_doc[3])
    # density: far fewer selections than shingle positions
    n_positions = sum(len(t.split()) - 1 for _, t in df.collect())
    assert n_sel < n_positions


def test_winnow_deterministic_rightmost_ties(spark):
    """Identical repeated shingles in one window must pick the
    RIGHTMOST position deterministically (the classic winnowing
    tie-break) — two runs give identical fingerprints."""
    from etl_capnz_spark.operators.text import winnow_fingerprints

    df = spark.createDataFrame(
        [(1, "x x x x x x x x")], "doc_id long, text string"
    )
    a = sorted(map(tuple, winnow_fingerprints(df, "text", "doc_id", w=4).collect()))
    b = sorted(map(tuple, winnow_fingerprints(df, "text", "doc_id", w=4).collect()))
    assert a == b
    # all shingles identical -> every window's min is the same hash and
    # the selected pos is the window's LAST row
    poss = sorted(p for _, p, _ in a)
    assert poss[0] == 3  # first window [0,3] -> rightmost = 3


def test_line_dedup_null_text_preserved(spark):
    df = spark.createDataFrame(
        [(1, "some sufficiently long line for the dedup threshold"), (2, None)],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["text"]
        for r in line_dedup_global(df, "text", "doc_id", min_chars=30).collect()
    }
    assert set(out) == {1, 2}
    assert out[2] == ""


# -------------------------------------------------------- pandas UDAF
def test_trimmed_mean_udaf_semantics(spark):
    """Grouped-agg pandas UDF: exact order-statistic trim, NULL for
    over-trimmed groups, robust against planted outliers."""
    from etl_capnz_spark.functions.udafs import trimmed_mean_udaf

    rows = [("a", float(v)) for v in range(1, 11)]  # 1..10
    rows += [("a", 1e9), ("a", -1e9)]  # outliers that a plain mean eats
    rows += [("b", 5.0)]  # too small once trimmed -> NULL
    df = spark.createDataFrame(rows, "g string, v double")
    tm = trimmed_mean_udaf(1)
    got = {
        r["g"]: r["t"]
        for r in df.groupBy("g").agg(tm("v").alias("t")).collect()
    }
    assert got["a"] == 5.5  # mean of 1..10 after dropping the outliers
    assert got["b"] is None


def test_midrange_udaf_equals_builtin(spark, sf_dir):
    """Pin the UDAF plumbing exactly against the built-in expression on
    real data: (min+max)/2 via pandas UDAF == via JVM aggregates."""
    from etl_capnz_spark.functions.udafs import midrange_udaf

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    mr = midrange_udaf()
    got = {
        r["event_type"]: r["m"]
        for r in ev.groupBy("event_type").agg(mr("value").alias("m")).collect()
    }
    want = {
        r["event_type"]: r["m"]
        for r in ev.groupBy("event_type")
        .agg(((F.min("value") + F.max("value")) / 2.0).alias("m"))
        .collect()
    }
    assert got == want


def test_trimmed_mean_guard():
    from etl_capnz_spark.functions.udafs import trimmed_mean_udaf

    with pytest.raises(ValueError):
        trimmed_mean_udaf(-1)


# ------------------------------------------------------------ hyperloglog
def test_hll_matches_pure_python_and_error_bound(spark):
    """HLL registers/estimate vs a from-scratch pure-Python HLL on the
    same 52-bit md5 hash: register tables identical, harmonic sum
    identical (exact integer), estimate bit-equal; and on a planted
    5000-distinct column the estimate lands within 3σ = 3·1.04/√256
    ≈ 19.5 % of truth (observed ≪ that; the loose bound keeps the pin
    hash-free)."""
    import hashlib
    import math

    from etl_capnz_spark.operators.frequency import (
        HLL_ALPHA_NUM,
        hll_estimate,
        hll_registers,
    )

    n = 5000
    df = spark.range(n).select(
        (F.col("id") * 7 + 13).cast("string").alias("v")
    )
    got = {
        r["j"]: r["m_j"]
        for r in hll_registers(df, [], "v").collect()
    }
    # pure-python reference sketch
    ref: dict[int, int] = {}
    for i in range(n):
        h = int(
            hashlib.md5(str(i * 7 + 13).encode()).hexdigest()[:13], 16
        )
        j, w = h % 256, h >> 8
        rho = 45 if w == 0 else 45 - (w.bit_length())
        ref[j] = max(ref.get(j, 0), rho)
    assert got == ref
    s = sum(1 << (45 - ref.get(j, 0)) for j in range(256))
    v = 256 - len(ref)
    e = (
        256.0 * math.log(256.0 / v)
        if (HLL_ALPHA_NUM / s <= 640.0 and v > 0)
        else HLL_ALPHA_NUM / s
    )
    row = hll_estimate(hll_registers(df, [], "v"), []).collect()[0]
    assert row["harmonic_sum"] == s and row["v_zero"] == v
    assert row["est_distinct"] == e
    assert abs(e - n) / n < 3 * 1.04 / 16


def test_hll_merge_equals_sketch_of_union(spark):
    """Register-wise max merge of two disjoint halves' sketches equals
    the sketch of the union EXACTLY (not approximately) — the property
    that makes per-day HLL columns roll up without re-scanning. Also:
    merge is idempotent (self-merge is a no-op)."""
    from etl_capnz_spark.operators.frequency import (
        hll_merge,
        hll_registers,
    )

    a = spark.range(0, 1000).select(F.col("id").cast("string").alias("v"))
    b = spark.range(500, 2000).select(
        F.col("id").cast("string").alias("v")
    )
    merged = hll_merge(
        hll_registers(a, [], "v").unionByName(hll_registers(b, [], "v")),
        [],
    )
    direct = hll_registers(a.unionByName(b), [], "v")
    as_set = lambda df: {(r["j"], r["m_j"]) for r in df.collect()}
    assert as_set(merged) == as_set(direct)
    self_merged = hll_merge(
        hll_registers(a, [], "v").unionByName(hll_registers(a, [], "v")),
        [],
    )
    assert as_set(self_merged) == as_set(hll_registers(a, [], "v"))


def test_hll_linear_counting_branch_and_alpha_literal(spark):
    """A 40-distinct input falls in the linear-counting regime
    (raw ≤ 2.5m, V > 0): estimate must be m·ln(m/V) and within 15 % of
    truth there (LC is near-exact at this occupancy). Also pins the
    oracle's embedded estimator literal to the exact repr of
    HLL_ALPHA_NUM — the one constant the SQL replay depends on."""
    import math

    from etl_capnz_spark.operators.frequency import (
        HLL_ALPHA_NUM,
        hll_estimate,
        hll_registers,
    )

    assert repr(HLL_ALPHA_NUM) == "1.6562238378542564e+18"
    df = spark.range(40).select(F.col("id").cast("string").alias("v"))
    row = hll_estimate(hll_registers(df, [], "v"), []).collect()[0]
    assert row["v_zero"] > 0
    assert row["est_distinct"] == 256.0 * math.log(
        256.0 / row["v_zero"]
    )
    assert abs(row["est_distinct"] - 40) / 40 < 0.15


def test_hll_null_values_are_not_values(spark):
    """count_distinct semantics: NULL values contribute nothing — no
    phantom j=NULL register, no occupancy inflation. A column of 40
    reals + 30 NULLs sketches identically to the 40 reals alone."""
    from etl_capnz_spark.operators.frequency import (
        hll_estimate,
        hll_registers,
    )

    base = spark.range(40).select(F.col("id").cast("string").alias("v"))
    with_nulls = base.unionByName(
        spark.range(30).select(F.lit(None).cast("string").alias("v"))
    )
    as_set = lambda df: {(r["j"], r["m_j"]) for r in df.collect()}
    assert as_set(hll_registers(with_nulls, [], "v")) == as_set(
        hll_registers(base, [], "v")
    )
    a = hll_estimate(hll_registers(with_nulls, [], "v"), []).collect()[0]
    b = hll_estimate(hll_registers(base, [], "v"), []).collect()[0]
    assert tuple(a) == tuple(b)
