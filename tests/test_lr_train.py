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
