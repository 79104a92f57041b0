"""Ordered-funnel and cohort-retention analytics over event streams —
the two classic product-analytics aggregations every events warehouse
serves (and therefore this engine must), both exactly SQL-expressible
and oracle-checked.

Scale shape: every stage aggregates or joins on the user key, so the
whole computation re-uses ONE hash partitioning; event payloads never
shuffle (only (user, ts) pairs per funnel level, each pre-filtered to
its step's event type — predicate pushdown keeps non-participating
rows out of the exchange entirely). Funnel levels chain joins instead
of window-scanning whole user timelines, so per-user state is one
timestamp, not the event history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
) -> DataFrame:
    """Strictly-ordered funnel: a user converts to step i+1 only with
    an event of that type STRICTLY AFTER their earliest qualifying
    time for step i (the standard product-analytics semantics — a
    purchase logged before the first view does not count, pinned in
    tests).

    Level i is (user, earliest qualifying ts); level i+1 filters the
    next step's events to ts > level_i.t and takes the min — a chain
    of keys-only joins, each step's scan pre-filtered to one event
    type. Output: (step int 1-based, step_name, n_users), one row per
    step, monotonically non-increasing.
    """
    user, ts = F.col(user_col), F.col(ts_col)
    level = (
        df.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts).alias("_t"))
    )
    out = level.agg(F.count(F.lit(1)).alias("n_users")).select(
        F.lit(1).alias("step"),
        F.lit(steps[0]).alias("step_name"),
        "n_users",
    )
    for i, step in enumerate(steps[1:], start=2):
        level = (
            df.filter(F.col(type_col) == step)
            .join(level, user_col)
            .filter(ts > F.col("_t"))
            .groupBy(user_col)
            .agg(F.min(ts).alias("_t"))
        )
        out = out.unionByName(
            level.agg(F.count(F.lit(1)).alias("n_users")).select(
                F.lit(i).alias("step"),
                F.lit(step).alias("step_name"),
                "n_users",
            )
        )
    return out


def retention_cohorts(
    df: DataFrame,
    user_col: str,
    ts_col: str,
) -> DataFrame:
    """Weekly cohort retention: users grouped by the ISO week of their
    FIRST event; for each (cohort, week-offset) the number of cohort
    members active that week. Offset 0 is the cohort's own week, so
    its count equals the cohort size.

    Two aggregations on the user key (first-seen, distinct
    user-weeks) plus one keys-only join; the offset is integer
    arithmetic on date_trunc('week') boundaries — exact and
    dialect-portable. Output: (cohort_week date, week_offset int,
    n_users), useful directly as the retention-triangle table.
    """
    first = df.groupBy(user_col).agg(
        F.date_trunc("week", F.min(ts_col)).cast("date").alias("cohort_week")
    )
    active = df.select(
        F.col(user_col),
        F.date_trunc("week", F.col(ts_col)).cast("date").alias("_week"),
    ).distinct()
    return (
        active.join(first, user_col)
        .groupBy(
            "cohort_week",
            (
                F.datediff(F.col("_week"), F.col("cohort_week")) / 7
            ).cast("int").alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
