"""Properties of the dataset-assembly operators (operators/sampling.py).

The core promise is DETERMINISM UNDER RE-PARTITIONING: unlike df.sample /
rand(), every selection and ordering here depends only on row values, so
any cluster layout yields the identical result set.
"""

from pyspark.sql import functions as F

from etl_capnz_spark.operators.sampling import (
    balanced_sample,
    deterministic_sample,
    pack_sequences,
    training_order,
)


def _ids(df, col="doc_id"):
    return sorted(r[col] for r in df.collect())


def test_sample_invariant_under_partitioning(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = _ids(deterministic_sample(docs, "doc_id", 10))
    b = _ids(deterministic_sample(docs.repartition(17, "source"), "doc_id", 10))
    c = _ids(deterministic_sample(docs.coalesce(1), "doc_id", 10))
    assert a == b == c
    assert 0 < len(a) < docs.count()


def test_sample_salt_changes_selection(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = _ids(deterministic_sample(docs, "doc_id", 10, salt="s1"))
    b = _ids(deterministic_sample(docs, "doc_id", 10, salt="s2"))
    assert a != b


def test_balanced_cap_exact(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = balanced_sample(emb, "vec_id", "label", 5)
    per = {
        r["label"]: r["n"]
        for r in out.groupBy("label").agg(F.count("*").alias("n")).collect()
    }
    full = {
        r["label"]: r["n"]
        for r in emb.groupBy("label").agg(F.count("*").alias("n")).collect()
    }
    for label, n in full.items():
        assert per[label] == min(n, 5)


def test_training_order_is_permutation_and_seed_sensitive(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    o1 = training_order(docs, "doc_id", seed="epoch0").collect()
    positions = sorted(r["position"] for r in o1)
    assert positions == list(range(len(o1)))
    o2 = {r["doc_id"]: r["position"] for r in
          training_order(docs, "doc_id", seed="epoch1").collect()}
    moved = sum(1 for r in o1 if o2[r["doc_id"]] != r["position"])
    assert moved > len(o1) // 2  # a new seed reshuffles most rows


def test_pack_bins_contiguous_and_budget_bounded(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source", F.lit(100).alias("n_tokens")
    )
    out = pack_sequences(docs, "doc_id", "n_tokens", 512, "source").collect()
    by_shard: dict = {}
    for r in sorted(out, key=lambda r: (r["source"], r["doc_id"])):
        by_shard.setdefault(r["source"], []).append(r)
    for rows in by_shard.values():
        # bins are non-decreasing in id order and fill to the budget:
        # with 100-token docs a 512 budget holds ceil(512/100)=6 at most
        # (5 full + the overshooting last one)
        bins = [r["bin"] for r in rows]
        assert bins == sorted(bins)
        from collections import Counter

        for _, n in Counter(bins).items():
            assert n <= 6


# --- property tests (hypothesis) -----------------------------------------

from hypothesis import given, settings, strategies as st


@settings(max_examples=15, deadline=None)
@given(
    toks=st.lists(st.integers(min_value=0, max_value=900), min_size=1,
                  max_size=40),
    budget=st.integers(min_value=100, max_value=1000),
)
def test_pack_property_bins_never_overshoot_by_more_than_last_doc(
    spark, toks, budget
):
    rows = [(i, t) for i, t in enumerate(toks)]
    df = spark.createDataFrame(rows, "doc_id int, n_tokens int")
    out = sorted(
        pack_sequences(df, "doc_id", "n_tokens", budget).collect(),
        key=lambda r: r["doc_id"],
    )
    # bins are non-decreasing, start at 0, and a new bin opens exactly
    # when the exclusive running sum crosses the budget boundary
    cum = 0
    for r in out:
        assert r["bin"] == cum // budget
        cum += r["n_tokens"]


@settings(max_examples=15, deadline=None)
@given(
    text=st.text(
        alphabet=st.characters(codec="ascii", exclude_characters="\x00"),
        max_size=200,
    )
)
def test_pii_redaction_leaves_no_email_or_long_number(spark, text):
    import re

    from etl_capnz_spark.operators.text import (
        PII_EMAIL_RE,
        PII_NUMBER_RE,
        redact_pii,
    )

    df = spark.createDataFrame([(text,)], "text string")
    red = df.select(redact_pii(F.col("text")).alias("r")).collect()[0]["r"]
    assert not re.search(PII_EMAIL_RE, red)
    assert not re.search(PII_NUMBER_RE, red)


def test_interleave_prefix_respects_weights(spark, sf_dir):
    from etl_capnz_spark.operators.sampling import interleave_sources

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = sorted(
        interleave_sources(
            docs, "doc_id", "source", {"src0": 3.0, "src1": 2.0}
        ).collect(),
        key=lambda r: r["position"],
    )
    # positions are a clean permutation
    assert [r["position"] for r in out] == list(range(len(out)))
    # in an early prefix, src0 appears ~3x and src1 ~2x as often as an
    # unweighted source (exact ratios hold while no source is exhausted)
    prefix = out[: len(out) // 3]
    from collections import Counter

    c = Counter(r["source"] for r in prefix)
    base = sum(v for k, v in c.items() if k not in ("src0", "src1")) / max(
        1, len(c) - 2
    )
    assert c["src0"] > 2.4 * base
    assert c["src1"] > 1.6 * base


def test_sharded_training_order_matches_global(spark, sf_dir):
    from etl_capnz_spark.operators.sampling import training_order_sharded

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    want = {
        r["doc_id"]: r["position"]
        for r in training_order(docs, "doc_id", seed="epoch0").collect()
    }
    got = {
        r["doc_id"]: r["position"]
        for r in training_order_sharded(
            docs, "doc_id", seed="epoch0", n_shards=8
        ).collect()
    }
    assert got == want


def test_hll_union_accuracy(spark, sf_dir):
    """The HLL estimates must land within 5% of exact distinct counts,
    and the hll_union_agg of the per-group sketches must estimate the
    GLOBAL distinct — i.e. sketches really merge (the property that lets
    100 TB distinct-counts re-aggregate without rescanning raw data)."""
    import __spark_entry__ as entrymod
    from pyspark.sql import functions as F

    from etl_capnz_spark.session import read_table

    rows = {
        r["event_type"]: r["approx_users"]
        for r in entrymod.queries()["approx_hll_union"](
            spark, sf_dir
        ).collect()
    }
    ev = read_table(spark, sf_dir, "events")
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    exact["ALL"] = ev.select("user_id").distinct().count()
    assert set(rows) == set(exact)
    for key, want in exact.items():
        assert abs(rows[key] - want) <= max(2, 0.05 * want), (
            key,
            rows[key],
            want,
        )


def test_samples_invariant_to_partitioning(spark, sf_dir):
    """Hash-based sampling/splitting must select the SAME rows no matter
    how the input is partitioned — the property that distinguishes the
    md5 selectors from df.sample()'s partition-seeded RNG (and what makes
    samples reproducible across clusters and reruns)."""
    from etl_capnz_spark.operators.sampling import (
        deterministic_sample,
        weighted_sample,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    for df_variant in (docs.repartition(1), docs.repartition(13, "source")):
        det = {
            r["doc_id"]
            for r in deterministic_sample(df_variant, "doc_id", 10).collect()
        }
        base = {
            r["doc_id"]
            for r in deterministic_sample(docs, "doc_id", 10).collect()
        }
        assert det == base
        w = {
            r["doc_id"]
            for r in weighted_sample(
                df_variant.select("doc_id", "n_chars"),
                "doc_id",
                "n_chars",
                20,
            ).collect()
        }
        wbase = {
            r["doc_id"]
            for r in weighted_sample(
                docs.select("doc_id", "n_chars"), "doc_id", "n_chars", 20
            ).collect()
        }
        assert w == wbase


def test_wau_hll_tracks_exact(spark, sf_dir):
    """Windowed sketch-merge WAU must track the exact rolling distinct
    within 5% on every day — the per-day sketches really merge across
    the 7-day window (the pattern that answers any rolling window from
    stored per-partition sketches without rescanning raw events)."""
    import __spark_entry__ as entrymod

    approx = {
        r["wday"]: r["approx_wau"]
        for r in entrymod.queries()["events_wau_hll"](spark, sf_dir).collect()
    }
    exact = {
        r["wday"]: r["wau"]
        for r in entrymod.queries()["events_wau"](spark, sf_dir).collect()
    }
    assert set(approx) == set(exact)
    for day, want in exact.items():
        assert abs(approx[day] - want) <= max(2, 0.05 * want), (
            day,
            approx[day],
            want,
        )


def test_leakage_safe_split_no_straddle(spark):
    """Every dedup-cluster lands whole in ONE split (the invariant the
    per-doc hash split cannot give), singletons hash like before, and
    the fractions are roughly honored at cluster granularity."""
    from pyspark.sql import functions as F

    from etl_capnz_spark.operators.sampling import leakage_safe_split

    docs = spark.range(0, 2000).select(F.col("id").alias("doc_id"))
    # clusters: (3k, 3k+1, 3k+2) chained for k < 200 → 200 clusters of 3
    pairs = spark.createDataFrame(
        [(3 * k, 3 * k + 1) for k in range(200)]
        + [(3 * k + 1, 3 * k + 2) for k in range(200)],
        "id_a long, id_b long",
    )
    out = leakage_safe_split(docs, pairs, "doc_id", salt="t").cache()
    per_cluster = (
        out.groupBy("split_group")
        .agg(F.countDistinct("split").alias("n_splits"))
        .agg(F.max("n_splits"))
        .collect()[0][0]
    )
    assert per_cluster == 1  # no cluster straddles a split boundary
    # all 3 members of a chained cluster share the min-id group label
    grp = {r["doc_id"]: r["split_group"] for r in out.collect()}
    for k in range(200):
        assert grp[3 * k] == grp[3 * k + 1] == grp[3 * k + 2] == 3 * k
    # singleton docs (id >= 600) are their own group
    assert all(grp[i] == i for i in range(600, 2000))
    frac = out.filter(F.col("split") == "train").count() / 2000
    assert 0.7 < frac < 0.9
    out.unpersist()


def test_weighted_sample_per_group_inclusion_probability(spark):
    """Efraimidis–Spirakis k=1 inclusion probability is EXACTLY
    w_i/Σw: over 400 deterministic trial-groups (two items, weights 9
    and 1), the heavy item must win ≈ 90% of trials. Deterministic
    hashes make the observed rate a fixed number; the pin allows a
    > 4σ band (binomial σ ≈ 1.5%)."""
    from pyspark.sql import functions as F

    from etl_capnz_spark.operators.sampling import (
        weighted_sample_per_group,
    )

    trials = spark.range(400)
    rows = trials.select(
        F.col("id").alias("trial"),
        F.explode(
            F.array(
                F.struct(
                    (F.col("id") * 2).alias("rid"), F.lit(9.0).alias("w")
                ),
                F.struct(
                    (F.col("id") * 2 + 1).alias("rid"),
                    F.lit(1.0).alias("w"),
                ),
            )
        ).alias("s"),
    ).select("trial", F.col("s.rid").alias("rid"), F.col("s.w").alias("w"))
    won = weighted_sample_per_group(rows, ["trial"], "rid", "w", k=1)
    heavy_wins = won.filter(F.col("w") == 9.0).count()
    assert won.count() == 400
    assert 0.84 <= heavy_wins / 400 <= 0.96


def test_weighted_sample_per_group_partition_invariance(spark, sf_dir):
    """The per-group reservoir must draw the SAME rows no matter how
    the input is partitioned, and exactly k per group."""
    from pyspark.sql import functions as F

    from etl_capnz_spark.operators.sampling import (
        weighted_sample_per_group,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang", "n_chars"
    )
    base = {
        (r["lang"], r["doc_id"])
        for r in weighted_sample_per_group(
            docs, ["lang"], "doc_id", "n_chars", k=3
        ).collect()
    }
    shuffled = {
        (r["lang"], r["doc_id"])
        for r in weighted_sample_per_group(
            docs.repartition(13, "doc_id"), ["lang"], "doc_id",
            "n_chars", k=3,
        ).collect()
    }
    assert base == shuffled
    per_group = (
        weighted_sample_per_group(docs, ["lang"], "doc_id", "n_chars", k=3)
        .groupBy("lang")
        .count()
        .collect()
    )
    assert all(r["count"] == 3 for r in per_group)


def test_quantile_normalize_matches_pure_python_and_partition_invariant(spark):
    """Each row's norm_value is the global value at round(pr*(N-1))+1
    in (value, id) order, pr = within-source percent_rank; min maps to
    global min, max to global max; single-row sources map to pr=0."""
    import random

    from etl_capnz_spark.operators.sampling import quantile_normalize

    rng = random.Random(13)
    rows = [(i, f"s{i % 3}", rng.randrange(0, 1000)) for i in range(90)]
    rows.append((90, "lonely", 500))  # single-row source -> pr = 0
    df = spark.createDataFrame(rows, "doc_id long, source string, v long")

    glob = sorted((v, i) for i, _, v in rows)
    N = len(glob)
    by_src = {}
    for i, s, v in rows:
        by_src.setdefault(s, []).append((v, i))
    expect = {}
    for s, vs in by_src.items():
        vs.sort()
        n = len(vs)
        for rk, (v, i) in enumerate(vs):
            pr = 0.0 if n == 1 else rk / (n - 1)
            idx = round(pr * (N - 1))
            # Python rounds half-even; both engines round half-up on
            # positives — recompute the half-case the engines' way
            x = pr * (N - 1)
            if x - int(x) == 0.5:
                idx = int(x) + 1
            expect[i] = glob[idx][0]
    for frame in (df, df.repartition(7)):
        got = {
            r["doc_id"]: r["norm_value"]
            for r in quantile_normalize(
                frame, "doc_id", "v", "source"
            ).collect()
        }
        assert got == expect
    assert expect[90] == glob[0][0]  # lonely source pinned to pr=0


def test_rolling_origin_folds_no_future_leak_and_expanding(spark):
    """Temporal-wall invariants on a crafted 40-day series: (1) every
    test row of fold i is strictly AFTER every train row of the same
    fold (no future leak); (2) train windows strictly expand with i;
    (3) a row never appears twice in one fold; (4) fold walls are
    partition-invariant."""
    import datetime as dt

    from etl_capnz_spark.operators.sampling import rolling_origin_folds

    rows = [
        (i, dt.datetime(2024, 3, 1) + dt.timedelta(days=i))
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp")
    out = rolling_origin_folds(df, "ts", k=3).collect()
    by_fold = {}
    for r in out:
        by_fold.setdefault(r["fold"], {"train": set(), "test": set()})
        by_fold[r["fold"]][r["split"]].add(r["event_id"])
    assert sorted(by_fold) == [1, 2, 3]
    for i, parts in by_fold.items():
        assert parts["train"] and parts["test"]
        assert max(parts["train"]) < min(parts["test"]), i
        assert not parts["train"] & parts["test"]
    assert by_fold[1]["train"] < by_fold[2]["train"] < by_fold[3]["train"]
    again = rolling_origin_folds(df.repartition(7), "ts", k=3).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, out))


def test_negative_samples_deterministic_no_self_k_each(spark):
    """Every anchor draws exactly k distinct non-self negatives on a
    corpus comfortably larger than k·oversample; the same seed
    reproduces the identical sample under a different partitioning;
    a different seed draws a different sample."""
    from etl_capnz_spark.operators.sampling import negative_samples

    df = spark.createDataFrame(
        [(i,) for i in range(100)], "doc_id long"
    )
    out = negative_samples(df, "doc_id", k=4).collect()
    by_anchor = {}
    for r in out:
        assert r["neg_id"] != r["anchor"]
        by_anchor.setdefault(r["anchor"], set()).add(r["neg_id"])
    assert len(by_anchor) == 100
    assert all(len(v) == 4 for v in by_anchor.values())
    again = sorted(
        map(tuple, negative_samples(
            df.repartition(7), "doc_id", k=4
        ).collect())
    )
    assert again == sorted(map(tuple, out))
    other = sorted(
        map(tuple, negative_samples(df, "doc_id", k=4, seed="neg1").collect())
    )
    assert other != again
