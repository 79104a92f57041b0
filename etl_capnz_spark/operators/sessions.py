"""Batch sessionization (gaps-and-islands) — SURVEY.md §2.10 extension.

The reference has no windowing at all; the engine exposes sessionization in
two forms: this batch gaps-and-islands operator (lag + running sum), and the
streaming ``session_window`` wrapper (streaming/stream.py).

Scale notes: one hash-partition exchange on ``user_col`` serves both window
functions AND the final aggregation (same key) — Catalyst reuses the
exchange. Skewed users (one user with millions of events) are the hazard at
100 TB; AQE skew handling does not apply to window functions, so extreme
skew calls for pre-splitting hot keys by day before sessionizing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Group events into sessions separated by > ``gap_minutes`` of silence.

    Output: one row per session — user, session_start, session_end,
    n_events, duration_ms.
    """
    gap_us = gap_minutes * 60 * 1_000_000
    w = Window.partitionBy(user_col).orderBy(ts_col)
    flagged = df.withColumn(
        "_new_session",
        (
            F.coalesce(
                F.unix_micros(F.col(ts_col))
                - F.unix_micros(F.lag(ts_col).over(w)),
                F.lit(gap_us + 1),
            )
            > gap_us
        ).cast("int"),
    ).withColumn(
        "_session_seq",
        F.sum("_new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return flagged.groupBy(user_col, "_session_seq").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count("*").alias("n_events"),
        (
            F.unix_millis(F.max(ts_col)) - F.unix_millis(F.min(ts_col))
        ).alias("duration_ms"),
    ).drop("_session_seq")


def sessionize_dynamic(
    df: DataFrame,
    gap_us_expr,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
) -> DataFrame:
    """Dynamic-gap sessionization: each event contributes the interval
    ``[ts, ts + gap)`` with a PER-EVENT gap (``gap_us_expr``, µs) and
    overlapping intervals merge — the batch twin of Spark's
    session_window(ts, gap_column) (half-open: an event exactly at the
    previous session's end starts a NEW session).

    Interval merging as gaps-and-islands: break when ts ≥ running max
    of previous events' (ts + gap); both window functions share ONE
    (user) exchange. ``order_col`` is the tie-break so runs are
    deterministic (same ts, different gaps would otherwise be
    partition-order dependent). Output: user, session_start, n_events,
    session_end_us (µs — the merged interval end).
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, order_col)
    end_us = F.unix_micros(F.col(ts_col)) + gap_us_expr
    prev_end = F.max(end_us).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = df.withColumn(
        "_brk",
        (
            prev_end.isNull()
            | (F.unix_micros(F.col(ts_col)) >= prev_end)
        ).cast("int"),
    ).withColumn(
        "_seq",
        F.sum("_brk").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        flagged.groupBy(user_col, "_seq")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.count("*").alias("n_events"),
            F.max(end_us).alias("session_end_us"),
        )
        .drop("_seq")
    )


def max_concurrency(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    duration_us,
    out_key: str | None = None,
) -> DataFrame:
    """Peak concurrency per key — the classic interval sweep ("what was
    the most sessions this user ever had open at once, and when did it
    first happen?"). Each row holds a resource for the HALF-OPEN
    interval ``[ts, ts + duration_us)`` (``duration_us`` is a per-row
    Column in µs): an interval ending exactly when another starts does
    NOT overlap it, matching :func:`sessionize_dynamic`'s boundary rule.

    Sweep-line without per-event state: +1/−1 deltas collapse to one
    NET row per (key, instant) FIRST (a map-side-combinable aggregate —
    this also makes the running sum tie-free and deterministic: the
    peak within an instant equals the prefix sum through it because
    ends and starts at the same instant commute once netted), then one
    per-key running sum + an unordered max share a single hash
    exchange on the key. Window rows are O(distinct instants per key),
    the same per-entity bound as every grouped kernel here.

    Output: (key, max_concurrent, ts_at_max µs — the FIRST instant the
    peak is reached).
    """
    out_key = out_key or key_col
    t_start = F.unix_micros(F.col(ts_col))
    starts = df.select(
        F.col(key_col).alias(out_key),
        t_start.alias("_t"),
        F.lit(1).alias("_d"),
    )
    ends = df.select(
        F.col(key_col).alias(out_key),
        (t_start + duration_us).alias("_t"),
        F.lit(-1).alias("_d"),
    )
    net = (
        starts.unionByName(ends)
        .groupBy(out_key, "_t")
        .agg(F.sum("_d").alias("_net"))
    )
    wk = Window.partitionBy(out_key)
    run = F.sum("_net").over(
        wk.orderBy("_t").rowsBetween(Window.unboundedPreceding, 0)
    )
    peaked = net.withColumn("_c", run).withColumn(
        "_max", F.max(F.col("_c")).over(wk)
    )
    return peaked.groupBy(out_key).agg(
        F.max("_max").cast("bigint").alias("max_concurrent"),
        F.min(F.when(F.col("_c") == F.col("_max"), F.col("_t"))).alias(
            "ts_at_max"
        ),
    )


def transition_counts(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    id_col: str,
    type_col: str,
) -> DataFrame:
    """First-order Markov transition counts over each key's event
    stream — the clickstream "what follows what" matrix behind path
    analysis and next-event models. ``lead()`` pairs each event with
    its successor on ONE (key)-hash exchange; the (from, to) aggregate
    reuses nothing heavier than a map-side-combinable count. Terminal
    events (no successor) aggregate under dst NULL so the per-src row
    sums equal the per-src event counts exactly — emitting raw counts,
    not probabilities, keeps the result integer-exact cross-engine
    (consumers derive P(to|from) = n / sum(n) over src).

    Output: (src_type, dst_type nullable, n), ordered by nothing —
    ties are the caller's concern.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, id_col)
    return (
        df.withColumn("_nxt", F.lead(type_col).over(w))
        .groupBy(
            F.col(type_col).alias("src_type"),
            F.col("_nxt").alias("dst_type"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


def sequence_match(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    id_col: str,
    type_col: str,
    first: str,
    then: str,
    not_between: str | None = None,
    within_seconds: int | None = None,
) -> DataFrame:
    """MATCH_RECOGNIZE-lite event-sequence detection: every ``then``
    event matched to the MOST RECENT ``first`` event strictly before
    it on the same key, optionally rejected when a ``not_between``
    event falls strictly between the pair or when the gap exceeds
    ``within_seconds`` — the classic CEP shape ("view then purchase
    with no error in between, within a day").

    No self-join: per-key running ``max(CASE type)`` window aggregates
    over a ROWS frame (unbounded preceding → 1 preceding) carry "last
    A before me" and "last blocker before me", so the match test is a
    map-side predicate after ONE hash exchange on the key — the same
    single-partitioning shape as sessionize. A blocker at exactly the
    ``first`` event's timestamp is NOT between (strictness), which the
    ``last_c <= last_a`` comparison encodes for free. Ties order by
    (ts, id) for cross-engine determinism.

    Output: (key, first_ts, then_ts, gap_seconds) — one row per
    matched ``then`` event.
    """
    w = (
        Window.partitionBy(key_col)
        .orderBy(ts_col, id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    t = F.col(type_col)
    last_a = F.max(F.when(t == first, F.col(ts_col))).over(w)
    staged = df.withColumn("_last_a", last_a)
    cond = (t == then) & F.col("_last_a").isNotNull()
    if not_between is not None:
        last_c = F.max(F.when(t == not_between, F.col(ts_col))).over(w)
        staged = staged.withColumn("_last_c", last_c)
        cond = cond & (
            F.col("_last_c").isNull()
            | (F.col("_last_c") <= F.col("_last_a"))
        )
    gap = F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(
        F.col("_last_a")
    )
    if within_seconds is not None:
        cond = cond & (gap <= within_seconds)
    return staged.filter(cond).select(
        F.col(key_col),
        F.col("_last_a").alias("first_ts"),
        F.col(ts_col).alias("then_ts"),
        gap.alias("gap_seconds"),
    )
