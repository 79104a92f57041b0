"""Audit operators (operators/audit.py): fingerprints must be invariant
to partitioning/order, and snapshot_diff must classify each key right."""

from pyspark.sql import functions as F

from etl_capnz_spark.operators.audit import snapshot_diff, table_fingerprint


def test_fingerprint_invariant_to_partitioning(spark):
    df = spark.createDataFrame(
        [(i, "g%d" % (i % 3), "v%d" % i) for i in range(100)],
        "id bigint, grp string, val string",
    )
    a = table_fingerprint(df.repartition(1), "grp", "id", "val").collect()
    b = table_fingerprint(
        df.repartition(7, "val"), "grp", "id", "val"
    ).collect()
    key = lambda rows: sorted((tuple(r) for r in rows))
    assert key(a) == key(b)


def test_fingerprint_detects_single_value_change(spark):
    df1 = spark.createDataFrame(
        [(1, "g", "x"), (2, "g", "y")], "id bigint, grp string, val string"
    )
    df2 = spark.createDataFrame(
        [(1, "g", "x"), (2, "g", "z")], "id bigint, grp string, val string"
    )
    f1 = table_fingerprint(df1, "grp", "id", "val").collect()[0]
    f2 = table_fingerprint(df2, "grp", "id", "val").collect()[0]
    assert f1["n_rows"] == f2["n_rows"]
    assert f1["hash_sum"] != f2["hash_sum"]


def test_snapshot_diff_classification(spark):
    before = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k bigint, v string"
    )
    after = spark.createDataFrame(
        [(2, "b"), (3, "CHANGED"), (4, "d")], "k bigint, v string"
    )
    got = {
        r["k"]: r["change_type"]
        for r in snapshot_diff(before, after, "k", "v").collect()
    }
    assert got == {1: "removed", 2: "unchanged", 3: "changed", 4: "added"}


def test_snapshot_diff_null_value_perturbs_hash(spark):
    before = spark.createDataFrame([(1, "a")], "k bigint, v string")
    after = spark.createDataFrame(
        [(1, None)], "k bigint, v string"
    )
    got = snapshot_diff(before, after, "k", "v").collect()[0]
    assert got["change_type"] == "changed"


def test_check_constraints_counts_planted_violations(spark):
    """The quality suite must COUNT violations, not just pass on clean
    data: plant nulls, duplicate keys, out-of-range and out-of-set
    values, and an orphaned foreign key, and pin every count."""
    from pyspark.sql import functions as F

    from etl_capnz_spark.operators.audit import check_constraints, fk_violations

    rows = [
        (1, 10, 5.0, "O"),
        (2, None, -1.0, "F"),   # null custkey, negative price
        (2, 11, 0.0, "X"),      # duplicate key, zero price, bad status
        (3, 99, 2.5, "P"),      # orphan custkey (99 has no parent)
        (4, 10, None, "O"),     # null price -> range check violation
    ]
    child = spark.createDataFrame(
        rows, "k int, custkey int, price double, status string"
    )
    parent = spark.createDataFrame([(10,), (11,)], "custkey int")

    suite = check_constraints(
        child,
        not_null=["custkey"],
        unique=["k"],
        checks={
            "price_positive": F.col("price") > 0,
            "valid_status": F.col("status").isin("O", "F", "P"),
        },
    )
    got = {r["check"]: r["violations"] for r in suite.collect()}
    assert got["not_null:custkey"] == 1
    assert got["unique:k"] == 1          # one extra row beyond the first
    assert got["check:price_positive"] == 3  # -1, 0, NULL
    assert got["check:valid_status"] == 1    # 'X'
    fk = fk_violations(child, "custkey", parent, "custkey").collect()[0]
    assert fk["violations"] == 1        # custkey 99 (NULL is not a violation)


def test_profile_table_counts(spark):
    from pyspark.sql import functions as F  # noqa: F401

    from etl_capnz_spark.operators.audit import profile_table

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (2, "b"), (None, "b")], "x int, s string"
    )
    got = {r["column"]: r for r in profile_table(df, ["x", "s"]).collect()}
    assert got["x"]["n_nulls"] == 1 and got["x"]["n_distinct"] == 2
    assert got["x"]["min_s"] == "1" and got["x"]["max_s"] == "2"
    assert got["s"]["n_nulls"] == 1 and got["s"]["n_distinct"] == 2
    assert got["s"]["min_s"] == "a" and got["s"]["max_s"] == "b"


def test_kmv_merge_equals_sketch_of_union(spark, sf_dir):
    """Mergeability — the property that makes KMV a rollup-safe
    partial: per-day sketches merged per event_type must equal the
    sketch computed over the full table, EXACTLY (same hash function →
    union of k-min sets contains the true k-mins of the union)."""
    from pyspark.sql import functions as F

    from etl_capnz_spark.operators.audit import kmv_merge, kmv_sketch
    from etl_capnz_spark.session import read_table

    ev = read_table(spark, sf_dir, "events").withColumn(
        "day", F.to_date("ts")
    )
    full = {
        r["event_type"]: (r["sketch"], r["n_seen"], r["est_distinct"])
        for r in kmv_sketch(ev, ["event_type"], "user_id", k=32).collect()
    }
    per_day = kmv_sketch(ev, ["event_type", "day"], "user_id", k=32)
    merged = {
        r["event_type"]: (r["sketch"], r["n_seen"], r["est_distinct"])
        for r in kmv_merge(per_day, ["event_type"], k=32).collect()
    }
    assert merged == full


def test_kmv_estimate_accuracy_and_small_group_exactness(spark):
    """Estimate within the ~1/sqrt(k) KMV error band on a 5k-distinct
    column; a group with < k distinct values is EXACT."""
    from pyspark.sql import functions as F

    from etl_capnz_spark.operators.audit import kmv_sketch

    big = spark.range(5000).select(
        F.lit("big").alias("g"), F.col("id").alias("v")
    )
    small = spark.range(10).select(
        F.lit("small").alias("g"), (F.col("id") % 7).alias("v")
    )
    got = {
        r["g"]: r
        for r in kmv_sketch(
            big.unionByName(small), ["g"], "v", k=64
        ).collect()
    }
    assert got["small"]["est_distinct"] == 7.0
    assert got["small"]["n_seen"] == 7
    est = got["big"]["est_distinct"]
    assert abs(est - 5000) / 5000 < 0.5  # 3.5/sqrt(64) ≈ 0.44 worst band
    assert len(got["big"]["sketch"]) == 64
    assert got["big"]["sketch"] == sorted(got["big"]["sketch"])


def test_mad_outliers_planted_and_robust(spark):
    """MAD gate catches planted extremes, keeps inliers, and — unlike a
    stddev gate — its threshold is NOT inflated by the outliers
    themselves. A constant group (MAD=0) flags any deviation."""
    from etl_capnz_spark.operators.audit import mad_outliers

    rows = [("a", i, float(v)) for i, v in enumerate([10, 11, 9, 10, 12, 8, 10, 11, 9, 10])]
    rows += [("a", 100, 1000.0), ("a", 101, -1000.0)]  # planted extremes
    rows += [("c", 200 + i, 5.0) for i in range(6)] + [("c", 299, 6.0)]
    df = spark.createDataFrame(rows, "g string, event_id long, value double")
    out = mad_outliers(df, "value", "g", threshold=3.5).collect()
    flagged = {(r["g"], r["event_id"]) for r in out}
    assert ("a", 100) in flagged and ("a", 101) in flagged
    assert not any(g == "a" and e < 100 for g, e in flagged)  # inliers kept
    assert ("c", 299) in flagged  # MAD=0 group: any deviation flags
    zs = {r["event_id"]: r["robust_z"] for r in out}
    assert zs[100] > 0 and zs[101] < 0  # signed robust z


def test_quantile_sketch_merge_equals_sketch_of_union(spark, sf_dir):
    """Mergeability — the property that makes the bottom-k quantile
    sketch a rollup-safe partial: per-day sketches merged per
    event_type must equal the sketch computed over the full table,
    EXACTLY (same row-id hash → the k hash-smallest rows of the union
    are contained in the union of per-day k-smallest sets)."""
    from pyspark.sql import functions as F

    from etl_capnz_spark.operators.audit import (
        quantile_sketch,
        quantile_sketch_merge,
    )
    from etl_capnz_spark.session import read_table

    ev = read_table(spark, sf_dir, "events").withColumn(
        "day", F.to_date("ts")
    )
    full = {
        r["event_type"]: (
            r["sketch"], r["n_kept"], r["est_p50"], r["est_p90"],
            r["est_p99"],
        )
        for r in quantile_sketch(
            ev, ["event_type"], "value", "event_id", k=32
        ).collect()
    }
    per_day = quantile_sketch(
        ev, ["event_type", "day"], "value", "event_id", k=32
    )
    merged = {
        r["event_type"]: (
            r["sketch"], r["n_kept"], r["est_p50"], r["est_p90"],
            r["est_p99"],
        )
        for r in quantile_sketch_merge(
            per_day, ["event_type"], k=32
        ).collect()
    }
    assert merged == full


def test_quantile_sketch_dkw_accuracy_and_small_group_exactness(spark):
    """The sample quantile's rank error must sit inside the DKW bound
    eps = sqrt(ln(2/delta) / (2k)) ≈ 0.102 at k=256, delta=0.01
    (deterministic hashes make the observed error a fixed number — the
    pin asserts the bound the docstring promises). A group with fewer
    rows than k carries every row, so its estimates are the EXACT
    type-1 quantiles."""
    import math

    from pyspark.sql import functions as F

    from etl_capnz_spark.operators.audit import quantile_sketch

    n = 20000
    big = spark.range(n).select(
        F.lit("big").alias("g"),
        F.col("id").alias("rid"),
        F.col("id").cast("double").alias("v"),
    )
    small = spark.range(10).select(
        F.lit("small").alias("g"),
        F.col("id").alias("rid"),
        (F.col("id") * 10).cast("double").alias("v"),
    )
    got = {
        r["g"]: r
        for r in quantile_sketch(
            big.unionByName(small), ["g"], "v", "rid", k=256
        ).collect()
    }
    eps = math.sqrt(math.log(2 / 0.01) / (2 * 256))  # ≈ 0.1017
    for q, col in [(0.5, "est_p50"), (0.9, "est_p90"), (0.99, "est_p99")]:
        assert abs(got["big"][col] / n - q) < eps
    assert len(got["big"]["sketch"]) == 256
    # values 0,10,...,90: ceil(q*10)-th smallest — exact in this regime
    assert got["small"]["n_kept"] == 10
    assert got["small"]["est_p50"] == 40.0
    assert got["small"]["est_p90"] == 80.0
    assert got["small"]["est_p99"] == 90.0


def test_quantile_sketch_replay_dedupe(spark):
    """At-least-once safety: re-observing the same (id, value) rows
    collapses to one sample entry — the sketch of data ∪ data equals
    the sketch of data."""
    from pyspark.sql import functions as F

    from etl_capnz_spark.operators.audit import quantile_sketch

    base = spark.range(500).select(
        F.lit("g").alias("g"),
        F.col("id").alias("rid"),
        (F.col("id") % 37).cast("double").alias("v"),
    )
    once = quantile_sketch(base, ["g"], "v", "rid", k=64).collect()
    twice = quantile_sketch(
        base.unionAll(base), ["g"], "v", "rid", k=64
    ).collect()
    assert [tuple(r) for r in once] == [tuple(r) for r in twice]


def test_histogram_equidepth_ntile_semantics(spark):
    """Exact SQL-ntile semantics pinned by hand: 10 rows into 3 bins →
    sizes 4,3,3 (front-loaded remainder, NOT an even spread); fewer
    rows than bins → one row per bin; ties straddling a cut share the
    boundary value across adjacent bins; sizes always differ by ≤ 1."""
    from pyspark.sql import functions as F

    from etl_capnz_spark.operators.audit import histogram_equidepth

    ten = spark.range(10).select(
        F.col("id").alias("rid"), (F.col("id") * 10.0).alias("v")
    )
    got = {
        r["bin"]: (r["n_rows"], r["lo"], r["hi"])
        for r in histogram_equidepth(ten, "v", "rid", n_bins=3).collect()
    }
    assert got == {
        1: (4, 0.0, 30.0), 2: (3, 40.0, 60.0), 3: (3, 70.0, 90.0)
    }
    two = spark.range(2).select(
        F.col("id").alias("rid"), F.col("id").cast("double").alias("v")
    )
    small = {
        r["bin"]: r["n_rows"]
        for r in histogram_equidepth(two, "v", "rid", n_bins=5).collect()
    }
    assert small == {1: 1, 2: 1}
    # all-equal values: ties split by id, bounds collapse to the value
    const = spark.range(7).select(
        F.col("id").alias("rid"), F.lit(5.0).alias("v")
    )
    cg = {
        r["bin"]: (r["n_rows"], r["lo"], r["hi"])
        for r in histogram_equidepth(const, "v", "rid", n_bins=2).collect()
    }
    assert cg == {1: (4, 5.0, 5.0), 2: (3, 5.0, 5.0)}


def test_histogram_equidepth_partition_invariant(spark, sf_dir):
    """The two-phase sharded rank must produce identical bins no
    matter how the input is partitioned (the repartitionByRange
    re-sampling hazard is pinned down by the localCheckpoint)."""
    from etl_capnz_spark.operators.audit import histogram_equidepth

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    a = sorted(
        map(
            tuple,
            histogram_equidepth(ev, "value", "event_id", 8).collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            histogram_equidepth(
                ev.repartition(13, "user_id"), "value", "event_id", 8
            ).collect(),
        )
    )
    assert a == b
    assert sum(r[1] for r in a) == ev.count()


def test_kmv_set_ops_exact_regime_and_union_consistency(spark):
    """Two pins for theta-style KMV set algebra: (1) exhaustive regime
    (k > both set sizes) the union / intersection / Jaccard outputs are
    EXACT, not estimates; (2) at truncating k, est_union from the two
    sketches equals est_distinct of a sketch built over the raw unioned
    data (set algebra composes with mergeability), and the Jaccard
    estimate lands within the ~2/sqrt(k) band of truth."""
    from pyspark.sql import functions as F

    from etl_capnz_spark.operators.audit import kmv_set_ops, kmv_sketch

    a_vals = list(range(0, 600))           # |A|=600
    b_vals = list(range(400, 1000))        # |B|=600, |A∩B|=200, |A∪B|=1000
    rows = [("a", v) for v in a_vals] + [("b", v) for v in b_vals]
    df = spark.createDataFrame(rows, "side string, v long").withColumn(
        "g", F.lit(1)
    )
    av = df.filter("side = 'a'")
    bv = df.filter("side = 'b'")

    # (1) exhaustive: k = 2048 > 1000
    big = 2048
    r = kmv_set_ops(
        kmv_sketch(av, ["g"], "v", k=big),
        kmv_sketch(bv, ["g"], "v", k=big),
        ["g"], k=big,
    ).collect()[0]
    assert r["k_union"] == 1000 and r["n_common"] == 200
    assert r["est_union"] == 1000.0 and r["est_inter"] == 200.0
    assert abs(r["jaccard_est"] - 0.2) < 1e-9

    # (2) truncating: k = 64
    k = 64
    r = kmv_set_ops(
        kmv_sketch(av, ["g"], "v", k=k),
        kmv_sketch(bv, ["g"], "v", k=k),
        ["g"], k=k,
    ).collect()[0]
    union_sketch = kmv_sketch(df, ["g"], "v", k=k).collect()[0]
    assert r["est_union"] == union_sketch["est_distinct"]
    assert abs(r["jaccard_est"] - 0.2) < 2.0 / (k ** 0.5)
    assert abs(r["est_inter"] - 200.0) / 200.0 < 0.5


def test_benford_hand_case(spark):
    """Digit extraction from exact cents: values 1.23 (digit 1), 0.05
    (digit 5), 23.00 (digit 2), 999.99 (digit 9), 0.0 and -5.0 skipped;
    per-digit counts pinned and expected follows n·log10(1+1/d)."""
    import math

    from etl_capnz_spark.operators.audit import benford_digits

    vals = [1.23, 0.05, 23.00, 999.99, 0.0, -5.0, 1.01, 150.0]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    got = {r["digit"]: r for r in benford_digits(df, "v").collect()}
    # ALL digits 1-9 always present; absent digits ride with n_obs=0 so
    # their expected-count mass still lands in the chi^2
    assert sorted(got) == list(range(1, 10))
    assert {d: got[d]["n_obs"] for d in got} == {
        1: 3, 2: 1, 3: 0, 4: 0, 5: 1, 6: 0, 7: 0, 8: 0, 9: 1
    }
    n = 6
    for d, r in got.items():
        exp = n * math.log10(1 + 1 / d)
        assert abs(r["expected"] - exp) < 1e-6
        if r["n_obs"] == 0:
            # the fully-absent-digit contribution: (0 - exp)^2 / exp
            assert abs(r["chi2_contrib"] - exp) < 1e-6


def test_gini_known_distributions(spark):
    """Closed-form identities: equal shares give G = 0 exactly; one
    unit owning everything gives G = (n−1)/n exactly; and the result is
    invariant to input partitioning (the two-phase rank discipline)."""
    from etl_capnz_spark.operators.audit import gini_coefficient

    n = 40
    eq = spark.createDataFrame(
        [(i, 250) for i in range(n)], "id long, c long"
    )
    r = gini_coefficient(eq, "c", "id", cents=True).collect()[0]
    assert r["gini"] == 0.0 and r["n_units"] == n

    one = spark.createDataFrame(
        [(i, 10000 if i == 7 else 0) for i in range(n)], "id long, c long"
    )
    r = gini_coefficient(one, "c", "id", cents=True).collect()[0]
    # 2 − (n+1)/n and (n−1)/n round at different points: 1-ulp apart
    assert abs(r["gini"] - (n - 1) / n) < 1e-12

    skew = spark.createDataFrame(
        [(i, (i * 37) % 991 + 1) for i in range(200)], "id long, c long"
    )
    a = gini_coefficient(skew, "c", "id", cents=True).collect()[0]
    b = gini_coefficient(
        skew.repartition(13), "c", "id", cents=True
    ).collect()[0]
    assert a == b and 0.0 < a["gini"] < 1.0


def test_mutual_information_identities(spark):
    """Information-theory identities: independent columns give MI ≈ 0;
    a column with itself gives MI = H(x) (mi_norm = 1); a deterministic
    function of x gives mi_norm = 1 against the smaller entropy; and
    the pure-Python computation over the same counts agrees."""
    import math

    from etl_capnz_spark.operators.audit import mutual_information

    # independent: x = i%2, y = i%3 over a full 6-cycle -> exactly 0
    rows = [(i % 2, i % 3) for i in range(600)]
    df = spark.createDataFrame(rows, "x int, y int")
    r = mutual_information(df, "x", "y").collect()[0]
    assert r["mi_nats"] == 0.0 and r["n_cells"] == 6

    # self: MI == H(x)
    rows = [(i % 4, i % 4) for i in range(100)]
    df = spark.createDataFrame(rows, "x int, y int")
    r = mutual_information(df, "x", "y").collect()[0]
    assert abs(r["mi_nats"] - math.log(4)) < 1e-6
    assert r["mi_norm"] == 1.0

    # deterministic coarsening y = x//2: MI = H(y), mi_norm = 1
    rows = [(i % 4, (i % 4) // 2) for i in range(100)]
    df = spark.createDataFrame(rows, "x int, y int")
    r = mutual_information(df, "x", "y").collect()[0]
    assert abs(r["mi_nats"] - math.log(2)) < 1e-6
    assert r["mi_norm"] == 1.0


def test_zipf_fit_recovers_planted_power_law(spark):
    """Plant an exact power-law corpus: token t_r appears
    round(1000/r) times for ranks 1..20 — the fitted slope must land
    near −1 and the intercept near ln(1000); a flat corpus (all tokens
    equally frequent) must fit slope ≈ 0."""
    import math

    from etl_capnz_spark.operators.text import zipf_fit

    words = []
    for r in range(1, 21):
        words += [f"w{r:02d}"] * round(1000 / r)
    text = " ".join(words)
    df = spark.createDataFrame([(text,)], "text string")
    r = zipf_fit(df, "text").collect()[0]
    assert abs(r["slope"] + 1.0) < 0.05
    assert abs(r["intercept"] - math.log(1000)) < 0.15
    assert r["vocab"] == 20

    # join AFTER replicating the list: `"...".join(...) * 10` fuses
    # t49t0 across the seam into a phantom token and tilts the fit
    flat = " ".join([f"t{i}" for i in range(50)] * 10)
    df = spark.createDataFrame([(flat,)], "text string")
    r = zipf_fit(df, "text").collect()[0]
    assert abs(r["slope"]) < 1e-6


def test_source_kl_identities(spark):
    """KL identities: a source distributed exactly like the corpus
    blend has KL = 0 (two identical sources); a source concentrated on
    tokens the other source never uses has KL = its share of
    ln(n/ns)... pinned directly against a pure-Python computation."""
    import math

    from etl_capnz_spark.operators.text import source_kl

    # two sources with IDENTICAL token distributions -> corpus blend
    # equals each source -> KL = 0 for both
    text = "alpha beta beta gamma"
    df = spark.createDataFrame(
        [("s1", text), ("s2", text)], "source string, text string"
    )
    for r in source_kl(df, "text", "source").collect():
        assert r["kl_nats"] == 0.0

    # disjoint vocabularies: compute expected KL in pure Python
    df = spark.createDataFrame(
        [("s1", "a a b"), ("s2", "c d d d")], "source string, text string"
    )
    got = {r["source"]: r for r in source_kl(df, "text", "source").collect()}
    # corpus: a:2 b:1 c:1 d:3, n=7; s1: n=3 -> terms for a,b
    kl1 = (2 / 3) * math.log((2 * 7) / (3 * 2)) + (1 / 3) * math.log(
        (1 * 7) / (3 * 1)
    )
    kl2 = (1 / 4) * math.log((1 * 7) / (4 * 1)) + (3 / 4) * math.log(
        (3 * 7) / (4 * 3)
    )
    assert abs(got["s1"]["kl_nats"] - kl1) < 1e-6
    assert abs(got["s2"]["kl_nats"] - kl2) < 1e-6
    assert got["s1"]["vocab"] == 2 and got["s2"]["vocab"] == 2


def test_chi2_independence_hand_table(spark):
    """2x2 hand case: ((10, 20), (30, 40)) — chi2 = N(ad-bc)^2 /
    (r1 r2 c1 c2) = 100*(400-600)^2/(30*70*40*60) = 0.793651 within
    rounding; marginals exact; contribs sum to the closed form."""
    from etl_capnz_spark.operators.audit import chi2_independence

    rows = (
        [("a", "x")] * 10 + [("a", "y")] * 20
        + [("b", "x")] * 30 + [("b", "y")] * 40
    )
    df = spark.createDataFrame(rows, "r string, c string")
    got = {(o["r"], o["c"]): o for o in
           chi2_independence(df, "r", "c").collect()}
    assert len(got) == 4
    assert got[("a", "x")]["row_total"] == 30
    assert got[("a", "x")]["col_total"] == 40
    assert got[("a", "x")]["expected"] == 12.0
    chi2 = sum(o["chi2_contrib"] for o in got.values())
    want = 100 * (10 * 40 - 20 * 30) ** 2 / (30 * 70 * 40 * 60)
    assert abs(chi2 - want) < 1e-5


def test_k_anonymity_flags_small_and_uniform_classes(spark):
    """A 2-record class violates k=3; a 4-record class whose sensitive
    value is constant violates l=2 but not k; NULL quasi-identifiers
    form their OWN class (a missing zip is linkable too)."""
    from etl_capnz_spark.operators.audit import k_anonymity

    rows = (
        [("a", 1, 100), ("a", 1, 200), ("a", 1, 300)]      # ok class
        + [("b", 2, 100), ("b", 2, 100)]                    # k-violation
        + [("c", 3, 50)] * 4                                # l-violation
        + [(None, 9, 10), (None, 9, 20), (None, 9, 30)]     # NULL QI class
    )
    df = spark.createDataFrame(rows, "seg string, nat int, bal long")
    got = {
        (r["seg"], r["nat"]): r
        for r in k_anonymity(
            df, ["seg", "nat"], "bal", k=3, l_div=2
        ).collect()
    }
    assert len(got) == 4
    ok = got[("a", 1)]
    assert ok["n"] == 3 and not ok["k_violation"] and not ok["l_violation"]
    kv = got[("b", 2)]
    assert kv["k_violation"] and kv["l_violation"]  # 2 rows, 1 value
    lv = got[("c", 3)]
    assert lv["n"] == 4 and not lv["k_violation"] and lv["l_violation"]
    nu = got[(None, 9)]
    assert nu["n"] == 3 and not nu["k_violation"] and not nu["l_violation"]


def test_randomized_response_exact_debias_and_privacy(spark):
    """The RR estimator is EXACT on the reported bits: recomputing
    T_hat from (n, n_reported_true) by hand reproduces est_true, and
    with flip_bp -> 0 the mechanism is the identity (est == truth).
    The reported column must differ from the truth on exactly the
    seeded-coin rows, independent of partitioning."""
    import pyspark.sql.functions as F

    from etl_capnz_spark.operators.audit import randomized_response_counts

    rows = [(i % 3, i, i % 2 == 0) for i in range(300)]
    df = spark.createDataFrame(rows, "grp int, id long, truth boolean")

    got = {
        r["grp"]: r
        for r in randomized_response_counts(
            df, "grp", "truth", "id", seed="t1", flip_bp=2500
        ).collect()
    }
    for g, r in got.items():
        want = round((10000 * r["n_reported_true"] - 2500 * r["n"]) / 5000.0, 6)
        assert r["est_true"] == want
        assert r["est_rate"] == round(want / r["n"], 6)

    # flip probability ~0 -> estimator returns the exact truth
    ident = {
        r["grp"]: r["est_true"]
        for r in randomized_response_counts(
            df, "grp", "truth", "id", seed="t1", flip_bp=1
        ).collect()
    }
    true_counts = {
        r["grp"]: r["t"]
        for r in df.groupBy("grp")
        .agg(F.sum(F.col("truth").cast("int")).alias("t"))
        .collect()
    }
    # with 300 rows and p_flip = 1e-4 the seeded coins flip nobody
    for g in true_counts:
        assert abs(ident[g] - true_counts[g]) < 0.2

    # partitioning invariance: coins depend only on (seed, id)
    got2 = {
        r["grp"]: (r["n"], r["n_reported_true"])
        for r in randomized_response_counts(
            df.repartition(13), "grp", "truth", "id", seed="t1",
            flip_bp=2500,
        ).collect()
    }
    assert got2 == {g: (r["n"], r["n_reported_true"]) for g, r in got.items()}

    import pytest as _pytest

    with _pytest.raises(ValueError):
        randomized_response_counts(df, "grp", "truth", "id", flip_bp=5000)


def test_decayed_counts_exact_weights_and_clamps(spark):
    """Hand-checkable decay ladder: events 0/7/14/70/700 days old at
    half-life 7 weigh exactly 1, 1/2, 1/4, 2^-10, 0 (shift-out); a
    FUTURE event clamps to full weight, never amplifies."""
    from etl_capnz_spark.operators.timeseries import decayed_counts

    import pytest as _pytest

    rows = [
        ("a", "2024-01-31 12:00:00"),   # age 0 -> 1
        ("a", "2024-01-24 00:00:00"),   # age 7 -> 1/2
        ("a", "2024-01-17 00:00:00"),   # age 14 -> 1/4
        ("b", "2023-11-22 00:00:00"),   # age 70 -> 2^-10
        ("b", "2022-03-02 00:00:00"),   # age 700 -> steps 100 -> clamp 62 -> 0
        ("c", "2024-02-10 00:00:00"),   # FUTURE -> clamp to 1
    ]
    df = spark.createDataFrame(rows, "grp string, ts_s string").selectExpr(
        "grp", "cast(ts_s as timestamp) AS ts"
    )
    got = {
        r["grp"]: r
        for r in decayed_counts(df, "grp", "ts", "2024-01-31", 7).collect()
    }
    assert got["a"]["n"] == 3 and got["a"]["decayed_count"] == 1.75
    assert got["b"]["decayed_count"] == round(2**-10, 6)
    assert got["c"]["decayed_count"] == 1.0  # future event clamped
    assert got["a"]["decay_ratio"] == round(1.75 / 3, 6)

    with _pytest.raises(ValueError):
        decayed_counts(df, "grp", "ts", "2024-01-31", 0)
