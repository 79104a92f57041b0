"""Crawl-frontier politeness scheduler (operators/frontier.py +
streaming frontier_schedule_stream) — VERDICT r3 item 2.

Batch invariants: per-host cap, (priority DESC, url ASC) ranking,
delay spacing, normalization-aware dedup/exclusion, and the two-phase
(pre_salt) top-k producing IDENTICAL output to the single-phase form.
Streaming e2e: rounds are scheduled with pinned per-host request
spacing, and a URL scheduled in round N never re-enters in round N+1.
"""

import json

from pyspark.sql import functions as F

from etl_capnz_spark.operators.frontier import (
    build_frontier,
    frontier_select,
    url_host,
)


def _frontier_df(spark):
    # host a: 5 candidates with priorities 5,4,3,2,1; host b: 2; host c: 1
    rows = (
        [(f"http://a.com/p{i}", "a.com", 5 - i) for i in range(5)]
        + [("http://b.com/x", "b.com", 9), ("http://b.com/y", "b.com", 1)]
        + [("http://c.com/only", "c.com", 2)]
    )
    return spark.createDataFrame(rows, "url string, host string, priority long")


def test_frontier_select_cap_rank_and_spacing(spark):
    got = frontier_select(
        _frontier_df(spark), k_per_host=3, delay_ms=500
    ).collect()
    by_host = {}
    for r in got:
        by_host.setdefault(r["host"], []).append(r)
    # cap respected
    assert {h: len(v) for h, v in by_host.items()} == {
        "a.com": 3, "b.com": 2, "c.com": 1,
    }
    # a.com: top-3 priorities 5,4,3 in rank order with 500ms spacing
    a = sorted(by_host["a.com"], key=lambda r: r["fetch_rank"])
    assert [r["priority"] for r in a] == [5, 4, 3]
    assert [r["not_before_ms"] for r in a] == [0, 500, 1000]
    # b.com: priority DESC ordering
    b = sorted(by_host["b.com"], key=lambda r: r["fetch_rank"])
    assert [r["url"] for r in b] == ["http://b.com/x", "http://b.com/y"]


def test_frontier_select_priority_tie_breaks_on_url(spark):
    df = spark.createDataFrame(
        [("http://t.com/b", "t.com", 7), ("http://t.com/a", "t.com", 7)],
        "url string, host string, priority long",
    )
    got = sorted(
        frontier_select(df, k_per_host=2).collect(),
        key=lambda r: r["fetch_rank"],
    )
    assert [r["url"] for r in got] == ["http://t.com/a", "http://t.com/b"]


def test_frontier_select_pre_salt_identical_output(spark):
    base = _frontier_df(spark)
    plain = {
        tuple(r) for r in frontier_select(base, k_per_host=3).collect()
    }
    for salt in (1, 2, 7):
        salted = {
            tuple(r)
            for r in frontier_select(
                base, k_per_host=3, pre_salt=salt
            ).collect()
        }
        assert salted == plain, f"pre_salt={salt} changed the selection"


def test_build_frontier_normalizes_and_excludes_crawled(spark):
    outlinks = spark.createDataFrame(
        [
            # three syntactic variants of ONE page, from 2 distinct srcs
            (1, "HTTP://Site.COM:80/page?b=2&a=1"),
            (1, "http://site.com/page?a=1&b=2#frag"),
            (2, "http://site.com/page?b=2&a=1&"),
            # a crawled page rediscovered under a messy variant
            (2, "HTTP://Done.NET:80/seen"),
            # fresh page, single src
            (2, "http://new.org/x"),
            # garbage must drop, not crash
            (1, "not a url"),
        ],
        "src long, url string",
    )
    crawled = spark.createDataFrame(
        [("http://done.net/seen",)], "url string"
    )
    got = {
        r["url"]: (r["host"], r["priority"])
        for r in build_frontier(outlinks, crawled).collect()
    }
    assert got == {
        # variants collapsed; priority = 2 DISTINCT srcs (not 3 anchors)
        "http://site.com/page?a=1&b=2": ("site.com", 2),
        "http://new.org/x": ("new.org", 1),
    }


def test_url_host_extracts_authority(spark):
    df = spark.createDataFrame(
        [("https://A.Com:8443/x",), ("http://plain.org/",)], "u string"
    )
    got = [r["h"] for r in df.select(url_host(F.col("u")).alias("h")).collect()]
    assert got == ["a.com:8443", "plain.org"]


def test_frontier_schedule_stream_rounds_and_spacing(spark, tmp_path):
    """Streaming e2e: two discovery micro-batches → two scheduling
    rounds. Pins per-host request spacing (exactly delay_ms apart in
    slot order) and cross-round exclusion (a URL scheduled in round 0
    never re-enters in round 1)."""
    from etl_capnz_spark.streaming.stream import frontier_schedule_stream

    land = tmp_path / "links"
    land.mkdir()
    sched_path = str(tmp_path / "schedule")
    crawled_path = str(tmp_path / "crawled")
    cp = str(tmp_path / "cp_frontier")
    schema = "src BIGINT, url STRING"

    def run_round():
        stream = spark.readStream.schema(schema).json(str(land))
        q = frontier_schedule_stream(
            stream, sched_path, crawled_path, cp,
            k_per_host=2, delay_ms=700,
        ).trigger(availableNow=True).start()
        q.awaitTermination(120)

    (land / "b1.jsonl").write_text(
        "\n".join(
            json.dumps({"src": s, "url": u})
            for s, u in [
                (1, "http://h1.com/a"),
                (2, "http://h1.com/a"),   # 2 votes -> rank 1 on h1
                (1, "http://h1.com/b"),
                (2, "http://h1.com/c"),   # tie with /b -> url order; k=2 drops one
                (1, "http://h2.com/z"),
            ]
        )
    )
    run_round()
    (land / "b2.jsonl").write_text(
        "\n".join(
            json.dumps({"src": s, "url": u})
            for s, u in [
                (3, "http://h1.com/a"),   # scheduled in round 0 -> excluded
                (3, "http://h1.com/c"),   # dropped by cap in round 0 -> eligible now
                (3, "http://h1.com/d"),
                (3, "http://h2.com/z"),   # scheduled in round 0 -> excluded
            ]
        )
    )
    run_round()

    sched = spark.read.parquet(sched_path).collect()
    rounds = {}
    for r in sched:
        rounds.setdefault(r["round"], []).append(r)
    assert set(rounds) == {0, 1}

    r0 = {r["url"]: r for r in rounds[0]}
    # k=2 on h1: the 2-vote /a first, then tie /b vs /c broken by url ASC
    assert set(r0) == {"http://h1.com/a", "http://h1.com/b", "http://h2.com/z"}
    assert r0["http://h1.com/a"]["fetch_rank"] == 1
    assert r0["http://h1.com/b"]["not_before_ms"] == 700

    r1 = {r["url"]: r for r in rounds[1]}
    # round-0 selections excluded; /c (previously capped out) + /d enter
    assert set(r1) == {"http://h1.com/c", "http://h1.com/d"}

    # per-host spacing pin: slot offsets are EXACTLY 0,700,1400,... in
    # rank order within every (round, host)
    for batch in rounds.values():
        per_host = {}
        for r in batch:
            per_host.setdefault(r["host"], []).append(r)
        for rows in per_host.values():
            rows.sort(key=lambda r: r["fetch_rank"])
            assert [r["not_before_ms"] for r in rows] == [
                700 * i for i in range(len(rows))
            ]

    # crawled index holds exactly everything ever scheduled
    crawled = {
        r["url"] for r in spark.read.parquet(crawled_path).collect()
    }
    assert crawled == set(r0) | set(r1)


def test_robots_rules_star_group_only(spark):
    from etl_capnz_spark.operators.frontier import robots_rules

    body = (
        "# comment line\n"
        "User-agent: evilbot\n"
        "Disallow: /\n"
        "\n"
        "User-agent: *\n"
        "Disallow: /private   # inline comment\n"
        "Allow: /private/ok\n"
        "Disallow:\n"          # empty -> allow-all, dropped
        "User-agent: other\n"
        "Disallow: /other\n"
    )
    df = spark.createDataFrame([("a.com", body)], "host string, body string")
    got = {
        (r["rule"], r["path_prefix"]) for r in robots_rules(df).collect()
    }
    # only the star group's non-empty directives survive
    assert got == {("disallow", "/private"), ("allow", "/private/ok")}


def test_robots_filter_longest_match(spark):
    from etl_capnz_spark.operators.frontier import robots_filter

    rules = spark.createDataFrame(
        [
            ("a.com", "disallow", "/p"),
            ("a.com", "allow", "/p/ok"),
            ("a.com", "disallow", "/p/ok/deep"),
        ],
        "host string, rule string, path_prefix string",
    )
    frontier = spark.createDataFrame(
        [
            ("a.com", "http://a.com/p/x"),          # blocked by /p
            ("a.com", "http://a.com/p/ok/x"),       # allow overrides
            ("a.com", "http://a.com/p/ok/deep/x"),  # longer disallow wins
            ("a.com", "http://a.com/free"),         # no rule
            ("b.com", "http://b.com/p/x"),          # no rules for host
        ],
        "host string, url string",
    )
    got = {r["url"] for r in robots_filter(frontier, rules).collect()}
    assert got == {
        "http://a.com/p/ok/x",
        "http://a.com/free",
        "http://b.com/p/x",
    }


def test_robots_filter_allow_wins_length_tie(spark):
    from etl_capnz_spark.operators.frontier import robots_filter

    rules = spark.createDataFrame(
        [("a.com", "disallow", "/page"), ("a.com", "allow", "/page")],
        "host string, rule string, path_prefix string",
    )
    frontier = spark.createDataFrame(
        [("a.com", "http://a.com/page/1")], "host string, url string"
    )
    assert robots_filter(frontier, rules).count() == 1


def test_frontier_torn_round_replay_and_committed_reader(spark, tmp_path):
    """The crash-window pins for the streaming scheduler:

    1. A TORN crawled-index admission for the in-flight round must not
       poison its own replay (the anti-join reads only round <
       batch_id) — the replayed round reschedules the same URLs.
    2. read_frontier_schedule serves only ledger-committed rounds: a
       torn/uncommitted schedule partition is invisible.
    """
    import os

    from etl_capnz_spark.streaming.stream import (
        _read_committed_epochs,
        frontier_schedule_stream,
        read_frontier_schedule,
    )

    land = tmp_path / "links_t"
    land.mkdir()
    sched_path = str(tmp_path / "schedule_t")
    crawled_path = str(tmp_path / "crawled_t")
    schema = "src BIGINT, url STRING"

    def run_round(cp):
        stream = spark.readStream.schema(schema).json(str(land))
        q = frontier_schedule_stream(
            stream, sched_path, crawled_path, cp, k_per_host=5,
        ).trigger(availableNow=True).start()
        q.awaitTermination(120)

    (land / "b1.jsonl").write_text(
        "\n".join(
            json.dumps({"src": 1, "url": u})
            for u in ["http://h1.com/a", "http://h1.com/b"]
        )
    )
    # simulate the crash: round 0's ADMISSIONS landed (torn or whole)
    # but the round never committed (no ledger entry, checkpoint not
    # advanced) — the replay must still schedule a and b
    spark.createDataFrame(
        [("http://h1.com/a",)], "url string"
    ).withColumn("round", F.lit(0).cast("bigint")).write.mode(
        "overwrite"
    ).option("partitionOverwriteMode", "dynamic").partitionBy(
        "round"
    ).parquet(crawled_path)

    run_round(str(tmp_path / "cp_t1"))
    got = {
        r["url"]
        for r in read_frontier_schedule(spark, sched_path)
        .filter(F.col("round") == 0)
        .collect()
    }
    assert got == {"http://h1.com/a", "http://h1.com/b"}, got
    assert _read_committed_epochs(sched_path) == ["round=0"]

    # an uncommitted (torn) schedule partition is invisible to readers
    spark.createDataFrame(
        [(9, "http://ghost.com/x", 0, 0)],
        "priority long, url string, slot int, start_ms long",
    ).withColumn("round", F.lit(7).cast("bigint")).write.mode(
        "overwrite"
    ).option("partitionOverwriteMode", "dynamic").partitionBy(
        "round"
    ).parquet(sched_path)
    assert os.path.isdir(os.path.join(sched_path, "round=7"))
    vis = {
        r["round"]
        for r in read_frontier_schedule(spark, sched_path).collect()
    }
    assert vis == {0}


def test_compact_parquet_crash_repair(spark, tmp_path):
    """compact_parquet's two-rename swap: every crash point leaves a
    complete copy, and the entry-time repair restores it. Simulated at
    the worst point — after `path -> trash`, before `staged -> path`
    (path missing entirely, the pre-r8 data-loss window)."""
    import os

    from etl_capnz_spark.streaming.stream import compact_parquet

    path = str(tmp_path / "landing")
    spark.range(100).toDF("x").repartition(8).write.parquet(path)
    assert len([f for f in os.listdir(path) if f.endswith(".parquet")]) == 8

    # simulate the mid-swap crash
    os.rename(path, path + "_precompact")
    assert not os.path.isdir(path)
    n = compact_parquet(spark, path, target_rows_per_file=1000)
    assert n == 1
    got = sorted(r["x"] for r in spark.read.parquet(path).collect())
    assert got == list(range(100))
    assert not os.path.isdir(path + "_precompact")
    assert not os.path.isdir(path + "_compacted")
