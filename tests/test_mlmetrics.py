"""Pins for mlmetrics: exact AUC, PSI drift, Cohen's kappa."""
import math

import pytest


def test_auc_exact_hand_cases(spark):
    """Perfect separation → 1.0; inverted → 0.0; all-tied → 0.5;
    a known sklearn-checkable mixed case; degenerate one-class → NULL."""
    from etl_capnz_spark.operators.mlmetrics import auc_exact

    def run(rows):
        df = spark.createDataFrame(rows, "s long, y int")
        return auc_exact(df, "s", "y").collect()[0]

    r = run([(10, 1), (9, 1), (2, 0), (1, 0)])
    assert r["auc"] == 1.0 and r["gini"] == 1.0

    r = run([(1, 1), (2, 1), (9, 0), (10, 0)])
    assert r["auc"] == 0.0 and r["gini"] == -1.0

    r = run([(5, 1), (5, 1), (5, 0), (5, 0)])
    assert r["auc"] == 0.5 and r["gini"] == 0.0

    # scores [1,2,3,3,4], labels [0,0,1,0,1]:
    # pairs (pos>neg): (3,1)+(3,2)+(4,1)+(4,2)+(4,3-tie=no,neg 3)
    # pos scores {3,4}, neg {1,2,3}: wins = (3>1)+(3>2)+(4>1)+(4>2)+(4>3)=5
    # ties: (3,3) -> 0.5 ; total pairs = 2*3 = 6 -> auc = 5.5/6
    r = run([(1, 0), (2, 0), (3, 1), (3, 0), (4, 1)])
    assert r["auc"] == round(5.5 / 6, 6)
    assert r["n_pos"] == 2 and r["n_neg"] == 3

    r = run([(1, 1), (2, 1)])
    assert r["auc"] is None and r["gini"] is None


def test_auc_exact_matches_brute_force_and_partition_invariant(spark):
    """Rank-identity AUC equals the O(n²) pair-counting definition on
    a 300-row tied-heavy random case, and is partition-invariant."""
    import random

    from etl_capnz_spark.operators.mlmetrics import auc_exact

    rng = random.Random(7)
    rows = [(rng.randint(0, 20), rng.randint(0, 1)) for _ in range(300)]
    pos = [s for s, y in rows if y == 1]
    neg = [s for s, y in rows if y == 0]
    wins = sum(1 for p in pos for q in neg if p > q)
    ties = sum(1 for p in pos for q in neg if p == q)
    brute = (wins + 0.5 * ties) / (len(pos) * len(neg))

    df = spark.createDataFrame(rows, "s long, y int")
    got = auc_exact(df, "s", "y").collect()[0]
    assert got["auc"] == round(brute, 6)
    got2 = auc_exact(df.repartition(13), "s", "y").collect()[0]
    assert got2 == got


def test_auc_exact_null_rows_drop_into_n_dropped(spark):
    """NULL label or NULL score rows are un-scorable, not negatives:
    they land in n_dropped and the AUC over the labeled rows is
    unchanged (the regression: n counted every row while sum(_y)
    skipped NULLs, so unlabeled rows silently inflated n_neg)."""
    from etl_capnz_spark.operators.mlmetrics import auc_exact

    clean = [(10, 1), (9, 1), (2, 0), (1, 0)]
    df = spark.createDataFrame(
        clean + [(7, None), (None, 1), (None, None)], "s long, y int"
    )
    r = auc_exact(df, "s", "y").collect()[0]
    assert r["n_pos"] == 2 and r["n_neg"] == 2
    assert r["n_dropped"] == 3
    assert r["auc"] == 1.0

    base = auc_exact(
        spark.createDataFrame(clean, "s long, y int"), "s", "y"
    ).collect()[0]
    assert base["n_dropped"] == 0
    assert (base["auc"], base["n_pos"], base["n_neg"]) == (
        r["auc"], r["n_pos"], r["n_neg"]
    )

    # all rows unlabeled: counts 0, AUC NULL (not a crash, not 0)
    allnull = spark.createDataFrame([(1, None)] * 3, "s long, y int")
    r3 = auc_exact(allnull, "s", "y").collect()[0]
    assert (r3["n_pos"], r3["n_neg"], r3["n_dropped"]) == (0, 0, 3)
    assert r3["auc"] is None


def test_psi_drift_null_bucket_meets_itself(spark):
    """A NULL bucket present on BOTH sides joins null-safe into ONE
    union-domain row (the regression: plain full-outer never matches
    NULL=NULL, so it emitted two one-sided rows, inflating K and
    reporting phantom drift)."""
    from etl_capnz_spark.operators.mlmetrics import psi_drift

    a = spark.createDataFrame(
        [("x",)] * 40 + [(None,)] * 10, "bucket string"
    )
    out = psi_drift(a, a, "bucket").collect()
    assert len(out) == 2  # K = {x, NULL}, not 3
    null_rows = [r for r in out if r["bucket"] is None]
    assert len(null_rows) == 1
    assert null_rows[0]["n_a"] == 10 and null_rows[0]["n_b"] == 10
    assert all(r["psi_contrib"] == 0.0 for r in out)


def test_psi_drift_identical_and_disjoint(spark):
    """Identical slices → every psi_contrib 0; a bucket present only
    on one side still emits a row (full-outer domain) with a positive
    contribution; contributions match the smoothed closed form."""
    from etl_capnz_spark.operators.mlmetrics import psi_drift

    a = spark.createDataFrame(
        [("x",)] * 50 + [("y",)] * 50, "bucket string"
    )
    out = {r["bucket"]: r for r in psi_drift(a, a, "bucket").collect()}
    assert all(r["psi_contrib"] == 0.0 for r in out.values())

    b = spark.createDataFrame(
        [("x",)] * 50 + [("z",)] * 50, "bucket string"
    )
    out = {r["bucket"]: r for r in psi_drift(a, b, "bucket").collect()}
    assert set(out) == {"x", "y", "z"}
    assert out["y"]["n_b"] == 0 and out["z"]["n_a"] == 0
    # smoothed shares: K=3 union buckets, N=100 each side
    pa_y, pb_y = (50 + 1) / 103, (0 + 1) / 103
    want = (pa_y - pb_y) * math.log(pa_y / pb_y)
    assert out["y"]["psi_contrib"] == round(want, 6)
    assert out["y"]["share_a"] == round(pa_y, 6)
    assert out["y"]["share_b"] == round(pb_y, 6)
    # drift is symmetric bucket-wise: y's contrib == z's contrib here
    assert out["y"]["psi_contrib"] == out["z"]["psi_contrib"]


def test_cohen_kappa_hand_cases(spark):
    """Textbook 2×2 case (Cohen 1960 shape): po/pe/kappa match the
    closed form; perfect agreement → 1; constant raters → NULL;
    NULL labels drop into n_dropped without moving kappa."""
    from etl_capnz_spark.operators.mlmetrics import cohen_kappa

    # classic: 20 yes-yes, 5 yes-no, 10 no-yes, 15 no-no
    rows = (
        [("yes", "yes")] * 20
        + [("yes", "no")] * 5
        + [("no", "yes")] * 10
        + [("no", "no")] * 15
    )
    df = spark.createDataFrame(rows, "a string, b string")
    r = cohen_kappa(df, "a", "b").collect()[0]
    po = 35 / 50
    pe = (25 * 30 + 25 * 20) / 50**2
    assert r["n"] == 50
    assert r["po"] == round(po, 6)
    assert r["pe"] == round(pe, 6)
    assert r["kappa"] == round((po - pe) / (1 - pe), 6)

    same = spark.createDataFrame(
        [("a", "a"), ("b", "b"), ("c", "c")], "a string, b string"
    )
    assert cohen_kappa(same, "a", "b").collect()[0]["kappa"] == 1.0

    const = spark.createDataFrame(
        [("a", "a")] * 5, "a string, b string"
    )
    assert cohen_kappa(const, "a", "b").collect()[0]["kappa"] is None

    with_null = df.unionByName(
        spark.createDataFrame(
            [("yes", None), (None, "no")], "a string, b string"
        )
    )
    r2 = cohen_kappa(with_null, "a", "b").collect()[0]
    assert r2["n"] == 50 and r2["n_dropped"] == 2
    assert r2["kappa"] == r["kappa"]


def test_cohen_kappa_rectangular_domains(spark):
    """A label used by only one rater contributes nothing to p_e but
    its rows still count in N — kappa well-defined on rectangular
    contingencies."""
    from etl_capnz_spark.operators.mlmetrics import cohen_kappa

    rows = [("a", "a")] * 4 + [("weird", "a")] * 2 + [("b", "b")] * 4
    df = spark.createDataFrame(rows, "a string, b string")
    r = cohen_kappa(df, "a", "b").collect()[0]
    po = 8 / 10
    pe = (4 * 6 + 4 * 4) / 100  # 'weird' has cb=0
    assert r["po"] == round(po, 6)
    assert r["pe"] == round(pe, 6)
    assert r["kappa"] == round((po - pe) / (1 - pe), 6)


def test_ks_test_identical_disjoint_and_hand_case(spark):
    """Identical samples → D=0, no rejection; fully separated samples
    → D=1, rejection; a hand-computed mixed case with ties."""
    from etl_capnz_spark.operators.mlmetrics import ks_test

    def run(a, b):
        da = spark.createDataFrame([(v,) for v in a], "v long")
        db = spark.createDataFrame([(v,) for v in b], "v long")
        return ks_test(da, db, "v").collect()[0]

    r = run([1, 2, 3, 4], [1, 2, 3, 4])
    assert r["d_stat"] == 0.0 and r["reject_05"] is False
    assert r["n_a"] == 4 and r["n_b"] == 4

    r = run([1, 2, 3] * 20, [10, 11, 12] * 20)
    assert r["d_stat"] == 1.0 and r["reject_05"] is True

    # a=[1,1,2,5], b=[2,3,3,4]: at v=1 gap |2/4-0|=.5; v=2 |3/4-1/4|=.5;
    # v=3 |3/4-3/4|=0; v=4 |3/4-1|=.25; v=5 |1-1|=0 → D=0.5
    r = run([1, 1, 2, 5], [2, 3, 3, 4])
    assert r["d_stat"] == 0.5


def test_ks_test_matches_brute_force(spark):
    """D equals the brute-force sup over the pooled support on a
    300-row tied-heavy random case, and is partition-invariant."""
    import random

    from etl_capnz_spark.operators.mlmetrics import ks_test

    rng = random.Random(11)
    a = [rng.randint(0, 30) for _ in range(180)]
    b = [rng.randint(5, 40) for _ in range(120)]
    support = sorted(set(a) | set(b))
    brute = max(
        abs(
            sum(1 for v in a if v <= x) / len(a)
            - sum(1 for v in b if v <= x) / len(b)
        )
        for x in support
    )
    da = spark.createDataFrame([(v,) for v in a], "v long")
    db = spark.createDataFrame([(v,) for v in b], "v long")
    got = ks_test(da, db, "v").collect()[0]
    assert got["d_stat"] == round(brute, 6)
    crit = 1.358 * math.sqrt((180 + 120) / (180 * 120))
    assert got["crit_05"] == round(crit, 6)
    assert got["reject_05"] is (brute > crit)
    got2 = ks_test(da.repartition(7), db.repartition(5), "v").collect()[0]
    assert got2 == got


def test_ks_test_nulls_and_empty_side(spark):
    """NULL values drop per side into n_dropped_*; an empty side emits
    NULL d_stat (a one-sided comparison is undefined, not 0)."""
    from etl_capnz_spark.operators.mlmetrics import ks_test

    da = spark.createDataFrame([(1,), (None,), (2,)], "v long")
    db = spark.createDataFrame([(None,), (None,), (3,)], "v long")
    r = ks_test(da, db, "v").collect()[0]
    assert r["n_a"] == 2 and r["n_b"] == 1
    assert r["n_dropped_a"] == 1 and r["n_dropped_b"] == 2

    empty = spark.createDataFrame([], "v long")
    r = ks_test(da, empty, "v").collect()[0]
    assert r["n_b"] == 0
    assert r["d_stat"] is None and r["reject_05"] is None


def test_spearman_hand_cases(spark):
    """Perfect monotone (nonlinear) → 1; perfect inverse → −1;
    constant margin → NULL; NULL pairs drop into n_dropped."""
    from etl_capnz_spark.operators.mlmetrics import spearman_corr

    def run(rows):
        df = spark.createDataFrame(rows, "x long, y long")
        return spearman_corr(df, "x", "y").collect()[0]

    r = run([(1, 1), (2, 4), (3, 9), (4, 16)])
    assert r["rho"] == 1.0

    r = run([(1, 16), (2, 9), (3, 4), (4, 1)])
    assert r["rho"] == -1.0

    r = run([(1, 5), (2, 5), (3, 5)])
    assert r["rho"] is None

    r = run([(1, 1), (None, 2), (3, None), (4, 4)])
    assert r["n"] == 2 and r["n_dropped"] == 2


def test_spearman_matches_pure_python_with_ties(spark):
    """Tie-averaged rho equals a pure-Python rank-then-Pearson replay
    on a 200-row tied-heavy case, and is partition-invariant."""
    import random

    from etl_capnz_spark.operators.mlmetrics import spearman_corr

    rng = random.Random(23)
    rows = [
        (rng.randint(0, 15), rng.randint(0, 25)) for _ in range(200)
    ]

    def avg_ranks(vals):
        order = sorted(range(len(vals)), key=lambda i: vals[i])
        ranks = [0.0] * len(vals)
        i = 0
        while i < len(order):
            j = i
            while (
                j + 1 < len(order)
                and vals[order[j + 1]] == vals[order[i]]
            ):
                j += 1
            r = (i + j) / 2 + 1
            for k in range(i, j + 1):
                ranks[order[k]] = r
            i = j + 1
        return ranks

    rx = avg_ranks([x for x, _ in rows])
    ry = avg_ranks([y for _, y in rows])
    n = len(rows)
    mx, my = sum(rx) / n, sum(ry) / n
    cov = sum((a - mx) * (b - my) for a, b in zip(rx, ry))
    vx = sum((a - mx) ** 2 for a in rx)
    vy = sum((b - my) ** 2 for b in ry)
    brute = cov / math.sqrt(vx * vy)

    df = spark.createDataFrame(rows, "x long, y long")
    got = spearman_corr(df, "x", "y").collect()[0]
    assert got["rho"] == pytest.approx(round(brute, 6), abs=2e-6)
    got2 = spearman_corr(df.repartition(9), "x", "y").collect()[0]
    assert got2 == got


def test_jsd_drift_identical_disjoint_and_one_sided(spark):
    """Identical slices → every contrib 0; disjoint slices → Σ = ln 2
    (the JSD upper bound); a one-sided bucket contributes exactly
    ½·q·ln 2; an entirely empty side → Σ = ½·ln 2 (the zero-measure
    limit: the empty side's term vanishes wholesale), no NaN."""
    from etl_capnz_spark.operators.mlmetrics import jsd_drift

    def run(a, b):
        da = spark.createDataFrame([(v,) for v in a], "b string")
        db = spark.createDataFrame([(v,) for v in b], "b string")
        return {
            r["bucket"]: r for r in jsd_drift(da, db, "b").collect()
        }

    got = run(["x", "x", "y"], ["x", "x", "y"])
    assert all(r["jsd_contrib"] == 0.0 for r in got.values())

    got = run(["x", "x"], ["y", "y", "y"])
    assert len(got) == 2
    total = sum(r["jsd_contrib"] for r in got.values())
    assert total == pytest.approx(math.log(2), abs=2e-6)
    # one-sided bucket y: q = 1, contrib = ½·ln 2
    assert got["y"]["jsd_contrib"] == round(0.5 * math.log(2), 6)
    assert got["y"]["share_a"] == 0.0 and got["y"]["share_b"] == 1.0

    empty = spark.createDataFrame([], "b string")
    da = spark.createDataFrame([("x",), ("y",)], "b string")
    got = {
        r["bucket"]: r for r in jsd_drift(da, empty, "b").collect()
    }
    total = sum(r["jsd_contrib"] for r in got.values())
    assert total == pytest.approx(0.5 * math.log(2), abs=2e-6)
    assert all(not math.isnan(r["share_b"]) for r in got.values())


def test_jsd_drift_matches_pure_python_and_null_bucket(spark):
    """Σ contribs equals a pure-Python JSD on a random mixed case; a
    NULL bucket on both sides meets itself in ONE row (the psi_drift
    null-safe-join discipline); symmetric in its arguments."""
    import random
    from collections import Counter

    from etl_capnz_spark.operators.mlmetrics import jsd_drift

    rng = random.Random(31)
    a = [str(rng.randint(0, 8)) for _ in range(200)]
    b = [str(rng.randint(3, 12)) for _ in range(150)]
    na, nb = Counter(a), Counter(b)

    def jsd():
        tot = 0.0
        for k in set(na) | set(nb):
            p, q = na[k] / len(a), nb[k] / len(b)
            m = (p + q) / 2
            tot += 0.5 * (p * math.log(p / m) if p else 0.0)
            tot += 0.5 * (q * math.log(q / m) if q else 0.0)
        return tot

    da = spark.createDataFrame([(v,) for v in a], "b string")
    db = spark.createDataFrame([(v,) for v in b], "b string")
    rows = jsd_drift(da, db, "b").collect()
    assert sum(r["jsd_contrib"] for r in rows) == pytest.approx(
        jsd(), abs=5e-6
    )
    swapped = jsd_drift(db, da, "b").collect()
    assert sum(r["jsd_contrib"] for r in swapped) == pytest.approx(
        jsd(), abs=5e-6
    )

    da = spark.createDataFrame([("x",), (None,)], "b string")
    db = spark.createDataFrame([(None,), (None,)], "b string")
    got = jsd_drift(da, db, "b").collect()
    assert len(got) == 2  # {x, NULL} — NULL met itself once
    nrow = [r for r in got if r["bucket"] is None][0]
    assert nrow["n_a"] == 1 and nrow["n_b"] == 2


def test_welch_z_matches_pure_python_and_guards(spark):
    """z and the A&S-polynomial p match a pure-Python replay on a
    random two-arm case; z=1.96 gives the textbook p≈0.05; a group
    with a <2-value arm or zero pooled variance emits NULL."""
    import random

    from etl_capnz_spark.operators.mlmetrics import welch_z_tests

    rng = random.Random(43)
    rows = []
    for _ in range(300):
        arm = rng.randint(0, 1)
        v = rng.randint(100, 500) + (25 if arm else 0)
        rows.append(("g1", arm, v))
    rows += [("tiny", 1, 5), ("tiny", 0, 7), ("tiny", 0, 9)]
    rows += [("const", 1, 4), ("const", 1, 4), ("const", 0, 4), ("const", 0, 4)]
    df = spark.createDataFrame(rows, "grp string, arm int, v long")
    got = {
        r["grp"]: r
        for r in welch_z_tests(df, "grp", "arm", "v").collect()
    }

    a = [v for g, arm, v in rows if g == "g1" and arm == 1]
    b = [v for g, arm, v in rows if g == "g1" and arm == 0]

    def mean(xs):
        return sum(xs) / len(xs)

    def var(xs):
        m = mean(xs)
        return sum((x - m) ** 2 for x in xs) / (len(xs) - 1)

    z = (mean(a) - mean(b)) / math.sqrt(
        var(a) / len(a) + var(b) / len(b)
    )
    assert got["g1"]["z"] == pytest.approx(round(z, 6), abs=2e-6)
    x = abs(z) / math.sqrt(2)
    t = 1 / (1 + 0.3275911 * x)
    poly = (
        (((1.061405429 * t - 1.453152027) * t + 1.421413741) * t
         - 0.284496736) * t + 0.254829592
    ) * t
    assert got["g1"]["p_value"] == pytest.approx(
        round(poly * math.exp(-x * x), 6), abs=2e-6
    )
    # A&S 7.1.26 sanity: the polynomial itself reproduces the
    # textbook two-sided 5% point (within its 1.5e-7 bound)
    x196 = 1.96 / math.sqrt(2)
    t196 = 1 / (1 + 0.3275911 * x196)
    p196 = (
        (((1.061405429 * t196 - 1.453152027) * t196 + 1.421413741)
         * t196 - 0.284496736) * t196 + 0.254829592
    ) * t196 * math.exp(-x196 * x196)
    assert p196 == pytest.approx(0.04999, abs=5e-4)

    assert got["tiny"]["z"] is None and got["tiny"]["p_value"] is None
    assert got["const"]["z"] is None  # zero variance both arms


def test_bh_fdr_textbook_and_properties(spark):
    """q-values equal the pure-Python step-up on the classic BH-1995
    15-test p vector; q is monotone in rank, clamps at 1, NULL p rows
    drop, and `significant` uses the UNROUNDED q."""
    from etl_capnz_spark.operators.mlmetrics import bh_fdr

    ps = [
        0.0001, 0.0004, 0.0019, 0.0095, 0.0201, 0.0278, 0.0298,
        0.0344, 0.0459, 0.3240, 0.4262, 0.5719, 0.6528, 0.7590, 1.0,
    ]
    k = len(ps)
    raw = [p * k / (i + 1) for i, p in enumerate(ps)]
    qs = [min(min(raw[i:]), 1.0) for i in range(k)]

    rows = [(f"t{i:02d}", p) for i, p in enumerate(ps)]
    rows.append(("tnull", None))
    df = spark.createDataFrame(rows, "key string, p double")
    got = sorted(bh_fdr(df, "key", "p").collect(), key=lambda r: r["rank"])
    assert len(got) == k  # NULL p dropped
    assert [r["n_tests"] for r in got] == [k] * k
    for r, q in zip(got, qs):
        assert r["q_value"] == round(q, 6)
        assert r["significant"] is (q <= 0.05)
    # the classic result: exactly 4 rejections at alpha 0.05
    assert sum(1 for r in got if r["significant"]) == 4
    # q monotone non-decreasing in rank; clamped at 1
    assert all(
        got[i]["q_value"] <= got[i + 1]["q_value"]
        for i in range(k - 1)
    )
    assert got[-1]["q_value"] == 1.0


def test_bh_fdr_tie_break_is_total_and_partition_invariant(spark):
    """Equal p-values rank deterministically by key (the order is
    total, so both engines and any partitioning agree)."""
    from etl_capnz_spark.operators.mlmetrics import bh_fdr

    rows = [("b", 0.02), ("a", 0.02), ("c", 0.01)]
    df = spark.createDataFrame(rows, "key string, p double")
    got = sorted(bh_fdr(df, "key", "p").collect(), key=lambda r: r["rank"])
    assert [r["key"] for r in got] == ["c", "a", "b"]
    got2 = sorted(
        bh_fdr(df.repartition(5), "key", "p").collect(),
        key=lambda r: r["rank"],
    )
    assert got == got2


def test_conformal_matches_pure_python_and_guarantee(spark):
    """q̂ equals sorted(residuals)[⌈(n+1)(1−α)⌉ − 1] exactly on a
    tied-heavy random case; realized coverage matches the exact
    pure-Python ratio AND the ≥1−α guarantee holds in expectation;
    too-small calibration (m > n) → NULL, empty splits → NULL."""
    import math
    import random

    from etl_capnz_spark.operators.mlmetrics import conformal_interval

    rng = random.Random(59)
    rows = []
    for i in range(600):
        split = "cal" if i % 2 == 0 else "test"
        pred = rng.randint(90, 110)
        label = pred + rng.randint(-30, 30)
        rows.append((split, pred, label))
    df = spark.createDataFrame(rows, "split string, pred long, label long")
    got = conformal_interval(df, "split", "pred", "label", alpha=0.1)
    r = got.collect()[0]

    cal = sorted(
        abs(lb - p) for s, p, lb in rows if s == "cal"
    )
    n_cal = len(cal)
    m = math.ceil((n_cal + 1) * 0.9)
    qhat = cal[m - 1]
    tst = [abs(lb - p) for s, p, lb in rows if s == "test"]
    cov = sum(1 for x in tst if x <= qhat) / len(tst)
    assert (r["n_cal"], r["n_test"], r["m_rank"]) == (n_cal, len(tst), m)
    assert r["qhat"] == qhat
    assert r["coverage"] == round(cov, 6)
    assert r["coverage"] >= 0.85  # guarantee is ≥0.9 in expectation

    tiny = spark.createDataFrame(
        [("cal", 5, 7), ("test", 5, 6)], "split string, pred long, label long"
    )
    r2 = conformal_interval(
        tiny, "split", "pred", "label", alpha=0.1
    ).collect()[0]
    # n_cal=1 → m = ceil(2·0.9) = 2 > 1 → vacuous
    assert r2["m_rank"] == 2 and r2["qhat"] is None
    assert r2["coverage"] is None

    nocal = spark.createDataFrame(
        [("test", 5, 6)], "split string, pred long, label long"
    )
    r3 = conformal_interval(
        nocal, "split", "pred", "label", alpha=0.1
    ).collect()[0]
    assert r3["n_cal"] == 0 and r3["qhat"] is None

    # empty TEST split: q̂ is a calibration-side property, so it must
    # still be reported (the pre-fix F.max-through-test-agg shape
    # returned NULL); only coverage goes NULL — nothing to cover
    notest = spark.createDataFrame(
        [("cal", 10, 10), ("cal", 10, 11), ("cal", 10, 12),
         ("cal", 10, 13)],
        "split string, pred long, label long",
    )
    r4 = conformal_interval(
        notest, "split", "pred", "label", alpha=0.5
    ).collect()[0]
    assert r4["n_test"] == 0 and r4["qhat"] == 2
    assert r4["coverage"] is None


def test_conformal_hand_case_alpha_half(spark):
    """α=0.5, cal residuals {0,1,2,3}: m = ceil(5·0.5) = 3 →
    q̂ = 2; test residuals {0,3} → coverage 0.5."""
    from etl_capnz_spark.operators.mlmetrics import conformal_interval

    rows = [("cal", 10, 10), ("cal", 10, 11), ("cal", 10, 12),
            ("cal", 10, 13), ("test", 10, 10), ("test", 10, 13)]
    df = spark.createDataFrame(rows, "split string, pred long, label long")
    r = conformal_interval(df, "split", "pred", "label", alpha=0.5).collect()[0]
    assert r["m_rank"] == 3 and r["qhat"] == 2
    assert r["coverage"] == 0.5


def test_lift_gains_matches_pure_python_and_properties(spark):
    """Bucket assignment, per-bucket rates, lift and cumulative gains
    equal a pure-Python replay on a tied-heavy random case; a perfect
    scorer's top bucket has lift = 1/base_rate; gains reach exactly
    1.0 in the last non-empty bucket; partition-invariant."""
    import random
    from collections import defaultdict

    from etl_capnz_spark.operators.mlmetrics import lift_gains

    rng = random.Random(67)
    rows = [
        (rng.randint(0, 25), 1 if rng.random() < 0.3 else 0)
        for _ in range(400)
    ]
    df = spark.createDataFrame(rows, "s long, y int")
    got = sorted(
        lift_gains(df, "s", "y", buckets=10).collect(),
        key=lambda r: r["bucket"],
    )

    # pure-Python replay of the tie rule: distinct scores descending,
    # whole score group -> bucket floor(10*above/n), clamp 9
    n_total = len(rows)
    p_total = sum(y for _, y in rows)
    per_v = defaultdict(lambda: [0, 0])
    for s, y in rows:
        per_v[s][0] += 1
        per_v[s][1] += y
    above = 0
    buckets = defaultdict(lambda: [0, 0])
    for v in sorted(per_v, reverse=True):
        n, npos = per_v[v]
        b = min(9, (10 * above) // n_total)
        buckets[b][0] += n
        buckets[b][1] += npos
        above += n
    assert [r["bucket"] for r in got] == sorted(buckets)
    cum = 0
    for r in got:
        n, npos = buckets[r["bucket"]]
        cum += npos
        assert (r["n"], r["n_pos"]) == (n, npos)
        assert r["pos_rate"] == round(npos / n, 6)
        assert r["lift"] == round(
            (npos / n) / (p_total / n_total), 6
        )
        assert r["cum_pos_share"] == round(cum / p_total, 6)
    assert got[-1]["cum_pos_share"] == 1.0

    got2 = sorted(
        lift_gains(df.repartition(11), "s", "y", buckets=10).collect(),
        key=lambda r: r["bucket"],
    )
    assert got2 == got

    # perfect scorer: positives all score 100, negatives 0
    perfect = [(100, 1)] * 40 + [(0, 0)] * 360
    pf = lift_gains(
        spark.createDataFrame(perfect, "s long, y int"), "s", "y"
    ).collect()
    top = [r for r in pf if r["bucket"] == 0][0]
    assert top["pos_rate"] == 1.0
    assert top["lift"] == round(1 / 0.1, 6)
    assert top["cum_pos_share"] == 1.0


# ------------------------------------------------------------ wasserstein
@pytest.mark.slow
def test_w1_drift_matches_bruteforce(spark):
    """w1_drift vs the textbook area-between-CDFs computed in pure
    Python: identical distributions → 0, disjoint point masses → the
    distance between them, mixed supports exact; NULLs dropped and
    surfaced; empty side → NULL (undefined, not 0)."""
    from etl_capnz_spark.operators.mlmetrics import w1_drift

    def ref(a, b):
        vs = sorted(set(a) | set(b))
        na, nb = len(a), len(b)
        return round(
            sum(
                abs(
                    sum(x <= vs[i] for x in a) / na
                    - sum(x <= vs[i] for x in b) / nb
                )
                * (vs[i + 1] - vs[i])
                for i in range(len(vs) - 1)
            ),
            6,
        )

    cases = [
        ([1, 2, 3, 4, 5], [1, 2, 3, 4, 5]),
        ([0, 0, 0], [10, 10, 10]),
        ([1, 5, 7, 7, 9, 100], [2, 2, 3, 8, 50]),
        ([4], [9]),
        ([3, 3, 3], [3]),
        ([-5, 0, 5], [0]),
    ]
    for a, b in cases:
        da = spark.createDataFrame([(x,) for x in a], "v long")
        db = spark.createDataFrame([(x,) for x in b], "v long")
        row = w1_drift(da, db, "v").collect()[0]
        assert row["w1"] == ref(a, b), (a, b, row["w1"], ref(a, b))
        assert (row["n_a"], row["n_b"]) == (len(a), len(b))

    # NULL accounting + empty side
    dn = spark.createDataFrame([(1,), (None,), (3,)], "v long")
    d1 = spark.createDataFrame([(2,)], "v long")
    row = w1_drift(dn, d1, "v").collect()[0]
    assert (row["n_a"], row["n_dropped_a"], row["w1"]) == (2, 1, 1.0)
    empty = spark.createDataFrame([], "v long")
    assert w1_drift(d1, empty, "v").collect()[0]["w1"] is None


def test_w1_drift_translation_equivariance(spark):
    """W1's defining metric property on the line: shifting ONE
    distribution by c changes W1 by at most |c| and shifting BOTH by
    the same c leaves it unchanged — the sanity law bucketized drift
    scores (PSI) famously violate."""
    from etl_capnz_spark.operators.mlmetrics import w1_drift

    a = [1, 4, 4, 7, 12]
    b = [2, 3, 9, 9, 15]

    def w1(xs, ys):
        da = spark.createDataFrame([(x,) for x in xs], "v long")
        db = spark.createDataFrame([(y,) for y in ys], "v long")
        return w1_drift(da, db, "v").collect()[0]["w1"]

    base = w1(a, b)
    both = w1([x + 100 for x in a], [y + 100 for y in b])
    assert both == base
    one = w1([x + 100 for x in a], b)
    assert one <= base + 100 + 1e-9


def test_pr_curve_matches_bruteforce(spark):
    """pr_curve_topk vs sklearn-free brute force: every distinct
    threshold's tp/fp/fn counted directly, precision/recall/F1 from
    those integers, same (f1 desc, threshold asc) order; NULL scores
    and labels dropped; all-negative input yields f1=0 rows (no
    divide-by-zero on precision: every threshold is an attained
    score, so tp+fp ≥ 1)."""
    from etl_capnz_spark.operators.mlmetrics import pr_curve_topk

    data = [
        (9, 1), (8, 1), (8, 0), (7, 1), (5, 0), (5, 1), (4, 0),
        (2, 0), (2, 1), (1, 0), (None, 1), (6, None),
    ]
    df = spark.createDataFrame(data, "s long, y int")
    clean = [(s, y) for s, y in data if s is not None and y is not None]

    def brute(k):
        pts = []
        for t in sorted({s for s, _ in clean}):
            tp = sum(1 for s, y in clean if s >= t and y == 1)
            fp = sum(1 for s, y in clean if s >= t and y == 0)
            fn = sum(1 for s, y in clean if s < t and y == 1)
            f1 = 2.0 * tp / (2.0 * tp + fp + fn)
            pts.append((t, tp, fp, fn, round(tp / (tp + fp), 6),
                        round(tp / (tp + fn), 6), round(f1, 6), f1))
        pts.sort(key=lambda p: (-p[7], p[0]))
        return [p[:7] for p in pts[:k]]

    got = [
        (r["threshold"], r["tp"], r["fp"], r["fn"], r["precision"],
         r["recall"], r["f1"])
        for r in pr_curve_topk(df, "s", "y", k=5).collect()
    ]
    assert got == brute(5)

    allneg = spark.createDataFrame([(i, 0) for i in range(6)], "s long, y int")
    rows = pr_curve_topk(allneg, "s", "y", k=3).collect()
    assert all(
        r["f1"] == 0.0 and r["precision"] == 0.0
        and r["recall"] is None  # 0/0: NULL under ANSI, not NaN
        for r in rows
    )


def test_retrieval_metrics_hand_case(spark):
    """NDCG/MRR/MAP@k on a hand-computed 2-query fixture: query A has
    graded relevance with a known ideal reordering, query B has no
    relevant item (ndcg NULL, rr 0.0, ap NULL)."""
    from etl_capnz_spark.operators.mlmetrics import (
        map_at_k,
        mrr_at_k,
        ndcg_at_k,
    )

    rows = [
        # query A: ranked by score desc -> i1(rel3), i2(rel0),
        # i3(rel2), i4(rel1)
        ("A", "i1", 100, 3),
        ("A", "i2", 90, 0),
        ("A", "i3", 80, 2),
        ("A", "i4", 70, 1),
        # query B: nothing relevant
        ("B", "j1", 50, 0),
        ("B", "j2", 40, 0),
    ]
    df = spark.createDataFrame(rows, "q string, it string, s long, r int")

    nd = {
        r["query"]: r
        for r in ndcg_at_k(df, "q", "it", "s", "r", k=10).collect()
    }
    w = [1.0 / math.log2(i + 1) for i in range(1, 5)]
    dcg_a = 7 * w[0] + 0 * w[1] + 3 * w[2] + 1 * w[3]
    idcg_a = 7 * w[0] + 3 * w[1] + 1 * w[2] + 0 * w[3]
    assert nd["A"]["dcg"] == round(dcg_a, 6)
    assert nd["A"]["idcg"] == round(idcg_a, 6)
    assert nd["A"]["ndcg"] == round(dcg_a / idcg_a, 6)
    assert nd["B"]["ndcg"] is None and nd["B"]["dcg"] == 0.0

    mr = {
        r["query"]: r
        for r in mrr_at_k(df, "q", "it", "s", "r", k=10).collect()
    }
    assert mr["A"]["first_rel_rank"] == 1 and mr["A"]["rr"] == 1.0
    assert mr["B"]["first_rel_rank"] is None and mr["B"]["rr"] == 0.0

    ap = {
        r["query"]: r
        for r in map_at_k(df, "q", "it", "s", "r", k=10).collect()
    }
    # A: relevant at ranks 1,3,4 -> precisions 1/1, 2/3, 3/4; R=3
    want_ap = (1 / 1 + 2 / 3 + 3 / 4) / 3
    assert ap["A"]["n_rel"] == 3 and ap["A"]["ap"] == round(want_ap, 6)
    # exact-rational numerator: lcm(1..10)=2520
    assert ap["A"]["ap_num"] == 1 * 2520 + 2 * (2520 // 3) + 3 * (2520 // 4)
    assert ap["B"]["n_rel"] == 0 and ap["B"]["ap"] is None


def test_retrieval_metrics_k_cutoff_and_ties(spark):
    """The @k cutoff actually cuts (a relevant item at rank k+1 counts
    for R but not for the inner sums), and score ties break by item id
    so the ranking is a total order."""
    from etl_capnz_spark.operators.mlmetrics import (
        map_at_k,
        mrr_at_k,
        ndcg_at_k,
    )

    # 4 candidates, k=3; the ONLY relevant item is tied on score with
    # its neighbors and lands at rank 4 by the item tiebreak
    rows = [
        ("Q", "a", 10, 0),
        ("Q", "b", 10, 0),
        ("Q", "c", 10, 0),
        ("Q", "d", 10, 2),
    ]
    df = spark.createDataFrame(rows, "q string, it string, s long, r int")
    nd = ndcg_at_k(df, "q", "it", "s", "r", k=3).collect()[0]
    assert nd["dcg"] == 0.0  # the relevant item is outside the top 3
    assert nd["idcg"] > 0  # ideal ranking puts it first
    assert nd["ndcg"] == 0.0
    mr = mrr_at_k(df, "q", "it", "s", "r", k=3).collect()[0]
    assert mr["first_rel_rank"] is None and mr["rr"] == 0.0
    ap = map_at_k(df, "q", "it", "s", "r", k=3).collect()[0]
    assert ap["n_rel"] == 1 and ap["ap_num"] == 0 and ap["ap"] == 0.0


def test_recall_at_k_hand_case(spark):
    """recall@k on the same fixture family: hits inside the cutoff over
    ALL relevant; the rank-k+1 relevant item counts for R but not
    hits."""
    from etl_capnz_spark.operators.mlmetrics import recall_at_k

    rows = [
        ("A", "i1", 100, 3),
        ("A", "i2", 90, 0),
        ("A", "i3", 80, 2),
        ("A", "i4", 70, 1),
        ("B", "j1", 50, 0),
    ]
    df = spark.createDataFrame(rows, "q string, it string, s long, r int")
    got = {
        r["query"]: r
        for r in recall_at_k(df, "q", "it", "s", "r", k=3).collect()
    }
    # A: relevant at ranks 1,3,4 -> 2 of 3 inside k=3
    assert got["A"]["n_rel"] == 3 and got["A"]["hits_at_k"] == 2
    assert got["A"]["recall"] == round(2 / 3, 6)
    assert got["B"]["n_rel"] == 0 and got["B"]["recall"] is None
