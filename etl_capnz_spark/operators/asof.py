"""As-of join — an operator Spark lacks natively (SURVEY.md guide list).

``asof_join(left, right, on, by)`` attaches to every left row the most
recent right row with ``right.on <= left.on`` within the same ``by`` group
(the backward-direction as-of of time-series practice).

Implementation: the union trick — tag both inputs, union, sort by
(by, on, tag) with ONE hash-partition + sort exchange, then
``last_value(right payload, ignorenulls) over (partition by BY order by
ON, tag rows unbounded preceding)`` carries the latest right payload
forward onto left rows. Compared to the naive range join this is a single
shuffle of both inputs and no join explosion — the shape that survives
100 TB (equivalent to what ``pd.merge_asof`` does per group, but
distributed; an ``applyInPandas`` fallback would lose partial aggregation
and pay Arrow transfer).

Ties: a right row at exactly left.on is INCLUDED (<=); among equal ``on``
values the right row sorts first (tag 0 < 1), and among equal right rows
the last in (on, tie_col) order wins — deterministic given a tie-breaker.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    value_cols: list[str],
    tolerance_seconds: int | None = None,
    direction: str = "backward",
) -> DataFrame:
    """As-of join: left columns + nearest ``value_cols`` from right.

    ``direction='backward'`` (default) attaches the LATEST right row with
    ``right.on <= left.on``; ``'forward'`` the EARLIEST right row with
    ``right.on >= left.on`` — same union-sort-carry plan with the sort
    order reversed, so both directions cost one exchange.

    ``on`` and ``by`` must exist in both inputs with identical types.

    ``tolerance_seconds`` (pd.merge_asof's ``tolerance``): when set, a
    carried match further than the window is nulled out — the payload
    columns AND the carried timestamp together, so a stale match looks
    exactly like no match. Adds zero shuffles: it is a post-window
    projection over the already-carried ``asof_{on}``.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction}")
    if tolerance_seconds is not None and on not in value_cols:
        value_cols = [on, *value_cols]
    lt = left.withColumn("_tag", F.lit(1))
    for c in value_cols:
        lt = lt.withColumn(f"_r_{c}", F.lit(None).cast(dict(right.dtypes)[c]))
    rt = right.select(
        by,
        on,
        F.lit(0).alias("_tag"),
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
    )
    left_cols = [c for c in left.columns]
    unioned = lt.select(
        *left_cols, "_tag", *[f"_r_{c}" for c in value_cols]
    ).unionByName(rt, allowMissingColumns=True)

    on_order = (
        F.col(on).asc() if direction == "backward" else F.col(on).desc()
    )
    # Deterministic tie-break among equal right rows (ADVICE r2): order
    # the tied right rows by their payload columns ascending (nulls
    # last) so last_value carries the max-payload row — the same total
    # order cogroup_asof_join's full-column pandas sort produces, making
    # the bit-exact equivalence claim hold on tied data.
    # (no `on` key needed: tied rows share it by definition)
    tie_break = [F.col(f"_r_{c}").asc_nulls_last() for c in value_cols]
    w = (
        Window.partitionBy(by)
        .orderBy(on_order, F.col("_tag").asc(), *tie_break)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_asof_{c}")
            for c in value_cols
        ],
    )
    out = carried.filter(F.col("_tag") == 1).select(
        *left_cols,
        *[F.col(f"_asof_{c}").alias(f"asof_{c}") for c in value_cols],
    )
    if tolerance_seconds is not None:
        gap = F.unix_micros(F.col(on)) - F.unix_micros(F.col(f"asof_{on}"))
        if direction == "forward":
            gap = -gap
        fresh = gap <= tolerance_seconds * 1_000_000
        out = out.select(
            *left_cols,
            *[
                F.when(fresh, F.col(f"asof_{c}")).alias(f"asof_{c}")
                for c in value_cols
            ],
        )
    return out


def cogroup_asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    value_cols: list[str],
) -> DataFrame:
    """Backward as-of join via COGROUPED pandas (the PySpark
    ``groupBy(...).cogroup(...).applyInPandas`` surface): both inputs are
    hash-partitioned on ``by`` and each key's two row groups meet in ONE
    pandas callback running ``pd.merge_asof`` — the per-group algorithm
    of time-series practice, distributed.

    Same answer as :func:`asof_join` (pinned in tests/test_asof_rangejoin
    and by the shared driver oracle). Trade-offs vs the expression form:
    one exchange per side (same as the union trick) but Arrow transfer +
    Python execution per group, and no whole-stage codegen — the
    expression form is the hot-path choice; this one exists for logic
    too imperative to express in columns, and as the engine's cogroup
    API coverage.

    Scale: state per task is one ``by``-group's rows (both sides) in
    memory — the natural cogroup bound; skewed keys need salting before
    the cogroup, like any keyed aggregate.
    """
    import pandas as pd

    rtypes = dict(right.dtypes)
    out_schema = ", ".join(
        [f"{c} {t}" for c, t in left.dtypes]
        + [f"asof_{c} {rtypes[c]}" for c in value_cols]
    )
    lcols = [c for c, _ in left.dtypes]
    # Pre-rename the right side: cogroup serialization resolves columns
    # by NAME, and a name shared by both sides (here the `on` column)
    # reaches the pandas callback only once — the right frame arrives
    # without its copy. Distinct names sidestep the collision.
    rsel = [on] + [c for c in value_cols if c != on]
    right_r = right.select(
        F.col(by), *[F.col(c).alias(f"_r_{c}") for c in rsel]
    )

    def merge(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        if l.empty:
            return pd.DataFrame(
                columns=lcols + [f"asof_{c}" for c in value_cols]
            )
        l = l.sort_values(on, kind="mergesort")
        if r.empty:
            for c in value_cols:
                l[f"asof_{c}"] = None
            return l
        r = r[[f"_r_{c}" for c in rsel]]
        r = r.sort_values(
            list(r.columns), kind="mergesort"
        )  # total order -> deterministic tie winner
        merged = pd.merge_asof(
            l,
            r,
            left_on=on,
            right_on=f"_r_{on}",
            direction="backward",
        )
        # Unmatched left rows: merge_asof yields NaN/NaT — force true
        # NULLs (object dtype) so float columns don't surface NaN where
        # the expression form (and SQL) produce NULL.
        for c in value_cols:
            col = merged[f"_r_{c}"]
            merged[f"asof_{c}"] = col.astype(object).where(col.notna(), None)
        return merged[lcols + [f"asof_{c}" for c in value_cols]]

    return (
        left.groupBy(F.col(by))
        .cogroup(right_r.groupBy(F.col(by)))
        .applyInPandas(merge, out_schema)
    )
