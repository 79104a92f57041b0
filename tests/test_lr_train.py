"""Pins for lr_train_hashed: exact integer-trajectory parity with a
pure-Python replay, planted-separable convergence, loss monotonicity,
and partition invariance."""
import hashlib


def _replay(rows, d, iters):
    """Pure-Python replica of the integer training trajectory."""
    NANO = 10**9
    CLAMP = 8 * NANO

    def h32(t):
        return int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % d

    def toks(text):
        return [t for t in text.lower().strip().split() if t]

    def tdiv(a, b):
        q = abs(a) // b
        return q if a >= 0 else -q

    feats = [(y, sorted(set(h32(t) for t in toks(text)))) for text, y in rows]
    n = len(feats)
    w = {j: 0 for j in range(-1, d)}
    losses = []
    for _ in range(iters):
        g = {j: 0 for j in w}
        loss = 0
        for y, b in feats:
            z = w[-1] + sum(w[j] for j in b)
            zc = max(-CLAMP, min(CLAMP, z))
            p = 500_000_000 + tdiv(zc * NANO, 2 * (NANO + abs(zc)))
            e = p - y * NANO
            loss += e * e
            g[-1] += e
            for j in b:
                g[j] += e
        losses.append(loss)
        for j in w:
            w[j] -= tdiv(g[j], n)
    return w, losses


def test_lr_train_matches_python_replay_and_converges(spark):
    from etl_capnz_spark.operators.text import lr_train_hashed

    rows = []
    for i in range(60):
        if i % 2 == 0:
            rows.append((f"good clean prose sample {i % 5}", 1))
        else:
            rows.append((f"bad spam junk noise {i % 5}", 0))
    df = spark.createDataFrame(
        [(i, t, y) for i, (t, y) in enumerate(rows)],
        "doc_id long, text string, y int",
    )
    got = {
        r["feature"]: r["w_nano"]
        for r in lr_train_hashed(df, "text", "y", n_features=16,
                                 iters=8).collect()
    }
    want, losses = _replay(rows, d=16, iters=8)
    assert got == want  # bit-exact integer trajectory

    # planted-separable corpus: every doc classified correctly by sign
    def h32(t):
        return int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % 16

    for text, y in rows:
        z = want[-1] + sum(
            want[j] for j in set(h32(t) for t in text.lower().split())
        )
        assert (z > 0) == (y == 1), (text, z)

    # squared-error loss strictly decreases on the separable corpus
    assert all(a > b for a, b in zip(losses, losses[1:]))


def test_lr_train_partition_invariant(spark):
    """Integer gradient sums are order-independent: the trained weight
    vector is identical under any partitioning."""
    from etl_capnz_spark.operators.text import lr_train_hashed

    df = spark.createDataFrame(
        [
            (i, f"tok{i % 7} tok{i % 3} filler", i % 2)
            for i in range(50)
        ],
        "doc_id long, text string, y int",
    )
    a = sorted(
        tuple(r)
        for r in lr_train_hashed(df, "text", "y", 16, 5).collect()
    )
    b = sorted(
        tuple(r)
        for r in lr_train_hashed(
            df.repartition(17), "text", "y", 16, 5
        ).collect()
    )
    assert a == b


def test_lr_train_null_labels_excluded_from_n(spark):
    """NULL-label rows are unlabeled, not negative: they must neither
    contribute gradient NOR inflate the divisor n (the pre-fix shape
    silently diluted every update). Training with NULL rows present
    equals training on the labeled subset alone; all-NULL input
    returns the zero model instead of dividing by zero."""
    from etl_capnz_spark.operators.text import lr_train_hashed

    labeled = [
        (i, f"tok{i % 7} tok{i % 3} filler", i % 2) for i in range(40)
    ]
    df_lab = spark.createDataFrame(
        labeled, "doc_id long, text string, y int"
    )
    df_mixed = df_lab.unionByName(
        spark.createDataFrame(
            [(100 + i, f"unlabeled blob {i}", None) for i in range(25)],
            "doc_id long, text string, y int",
        )
    )
    a = sorted(
        tuple(r) for r in lr_train_hashed(df_lab, "text", "y", 16, 5).collect()
    )
    b = sorted(
        tuple(r)
        for r in lr_train_hashed(df_mixed, "text", "y", 16, 5).collect()
    )
    assert a == b

    all_null = spark.createDataFrame(
        [(1, "only unlabeled", None)], "doc_id long, text string, y int"
    )
    z = lr_train_hashed(all_null, "text", "y", 16, 5).collect()
    assert len(z) == 17 and all(r["w_nano"] == 0 for r in z)


def test_quality_lr_pipeline_gate_precision(spark):
    """Train→serve closure (the quality_lr_pipeline entry's shape): LR
    trained on a labeled slice of a planted-separable corpus, every
    document then scored with the trained integer weights and gated at
    p >= 0.5 — the gate must reproduce the planted good/spam split
    EXACTLY on this separable corpus (precision = recall = 1.0), and
    scoring must agree bit-for-bit with the pure-Python replay of the
    same weights."""
    import pyspark.sql.functions as F

    from etl_capnz_spark.operators.text import lr_train_hashed, tokens

    NANO = 10**9

    def mk(i):
        good = i % 2 == 0
        text = (
            f"good clean prose sample {i % 5}"
            if good
            else f"bad spam junk noise {i % 5}"
        )
        return (i, text, good)

    rows = [mk(i) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, text string, truth boolean")
    labeled = df.filter(F.col("doc_id") % 5 == 0).select(
        "doc_id", "text", F.col("truth").alias("y")
    )
    w = {
        int(r["feature"]): int(r["w_nano"])
        for r in lr_train_hashed(labeled, "text", "y", 16, 8).collect()
    }
    w_arr = F.array(*[F.lit(w[j]).cast("long") for j in range(16)])
    buckets = F.array_distinct(
        F.transform(
            tokens(F.col("text")),
            lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast(
                "bigint"
            )
            % 16,
        )
    )
    z = F.aggregate(
        buckets,
        F.lit(w[-1]).cast("long"),
        lambda acc, j: acc + F.element_at(w_arr, (j + 1).cast("int")),
    )
    zc = F.greatest(
        F.lit(-8 * NANO).cast("long"), F.least(F.lit(8 * NANO).cast("long"), z)
    )
    scored = df.select("doc_id", "truth", zc.alias("_zc")).selectExpr(
        "doc_id",
        "truth",
        "(500000000 + (_zc * 1000000000)"
        " div (2 * (1000000000 + abs(_zc)))) as p_nano",
    )
    got = scored.select(
        "doc_id", "truth", (F.col("p_nano") >= 500_000_000).alias("keep"),
        "p_nano",
    ).collect()

    # separable corpus: the gate reproduces the planted split exactly
    assert all(r["keep"] == r["truth"] for r in got)

    # bit-exact agreement with the pure-Python scoring of same weights
    import hashlib

    def h32(t):
        return int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % 16

    def tdiv(a, b):
        q = abs(a) // b
        return q if a >= 0 else -q

    by_id = {i: t for i, t, _ in rows}
    for r in got:
        toks = [t for t in by_id[r["doc_id"]].lower().strip().split() if t]
        zz = w[-1] + sum(w[j] for j in set(h32(t) for t in toks))
        zz = max(-8 * NANO, min(8 * NANO, zz))
        p = 500_000_000 + tdiv(zz * NANO, 2 * (NANO + abs(zz)))
        assert p == r["p_nano"], r


def test_gradient_pass_impls_identical(spark, monkeypatch):
    """The Arrow gradient pass (opt r10) and the literal-weights SQL
    pass must produce the bit-identical weight trajectory — including
    the NULL-bucket edge (contributes nothing, not even to the bias)
    and the empty-text edge (bias only)."""
    from etl_capnz_spark.operators.text import lr_train_hashed

    rows = [
        (0, "good clean prose", 1),
        (1, "bad spam junk", 0),
        (2, "", 1),           # no tokens: bias-only row
        (3, "   ", 0),        # whitespace-only: bias-only row
        (4, None, 1),         # NULL text: contributes nothing
        (5, "good prose again and again", 1),
        (6, "junk noise junk", 0),
        (7, None, None),      # unlabeled: filtered out entirely
    ] + [(10 + i, f"filler words number {i % 7}", i % 2) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string, y int")

    out = {}
    for impl in ("sql", "arrow"):
        monkeypatch.setenv("SPARK_GRAFT_LR_GRAD", impl)
        out[impl] = sorted(
            tuple(r)
            for r in lr_train_hashed(
                df, "text", "y", n_features=16, iters=6
            ).collect()
        )
    monkeypatch.delenv("SPARK_GRAFT_LR_GRAD", raising=False)
    assert out["sql"] == out["arrow"]
    assert any(w != 0 for _, w in out["arrow"])  # training moved
