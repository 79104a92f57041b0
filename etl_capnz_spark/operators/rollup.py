"""Incremental rollup maintenance (north-star extension, SURVEY.md
§2.12): keep a pre-aggregated rollup table current as new partitions
land WITHOUT rescanning history — the materialized-view pattern every
100 TB warehouse runs nightly.

The trick is mergeable partial aggregates: (count, sum, min, max) are
associative, so ``merge_rollups(rollup(old), rollup(new)) ==
rollup(old ∪ new)`` exactly — and that equality IS the oracle check.
Sums are integer cents (round(value·100)) because float sums are
partition-order-dependent across engines; avg is derived at read time
from the exact cents.

Scale shape: the history rollup is key-sized (days × types), the delta
aggregation scans only the new partition, and the merge is a groupBy
over two key-sized inputs — total cost O(new data + rollup size),
independent of history size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ROLLUP_COLS = ["n", "sum_cents", "min_cents", "max_cents"]


def partial_rollup(
    events: DataFrame,
    keys: list[str],
    value_col: str = "value",
) -> DataFrame:
    """Mergeable per-key partials over one slice of the fact table."""
    cents = F.round(F.col(value_col) * 100).cast("bigint")
    return events.groupBy(*keys).agg(
        F.count("*").alias("n"),
        F.sum(cents).alias("sum_cents"),
        F.min(cents).alias("min_cents"),
        F.max(cents).alias("max_cents"),
    )


def merge_rollups(a: DataFrame, b: DataFrame, keys: list[str]) -> DataFrame:
    """Associative merge of two partial-rollup tables (either side may
    be missing keys — union semantics)."""
    return (
        a.unionByName(b)
        .groupBy(*keys)
        .agg(
            F.sum("n").alias("n"),
            F.sum("sum_cents").alias("sum_cents"),
            F.min("min_cents").alias("min_cents"),
            F.max("max_cents").alias("max_cents"),
        )
    )


def rollup_with_avg(rollup: DataFrame, keys: list[str]) -> DataFrame:
    """Read-time projection: derive the exact average from the exact
    cents (sum_cents / n / 100, rounded to 6 dp)."""
    return rollup.select(
        *keys,
        *ROLLUP_COLS,
        F.round(F.col("sum_cents") / F.col("n") / 100.0, 6).alias("avg_value"),
    )


def delta_join_view(
    a_old: DataFrame,
    delta_a: DataFrame,
    b_old: DataFrame,
    delta_b: DataFrame,
    on: list[str],
    broadcast_deltas: bool = True,
) -> DataFrame:
    """Incremental maintenance of a JOIN view (insert-only): the delta
    rule Δ(A ⋈ B) = (ΔA ⋈ B) ∪ (A ⋈ ΔB) ∪ (ΔA ⋈ ΔB) — the join twin
    of the aggregate maintenance above, and the piece a materialized
    enriched-fact view needs when both the fact AND the dimension
    receive appends. Returns the DELTA rows; the caller unions them
    onto the stored view (``merge == full recompute`` is the oracle,
    the incremental_rollup contract).

    Scale shape: history (A, B) is never joined against history —
    every term is delta-driven, so total cost is O(Δ · matched rows),
    independent of view size. With ``broadcast_deltas`` the two
    delta-sided joins broadcast the (small by nature) delta batch and
    the big sides never shuffle at all; at 100 TB with a bucketed
    history table even the probe is co-located. Correctness needs the
    three terms to be DISJOINT in provenance, which insert-only
    guarantees: an (a, b) result pair lands in exactly one term
    depending on which side(s) of the wall each row arrived.
    """
    da = F.broadcast(delta_a) if broadcast_deltas else delta_a
    db = F.broadcast(delta_b) if broadcast_deltas else delta_b
    return (
        a_old.join(db, on)
        .unionByName(da.join(b_old, on))
        .unionByName(da.join(db, on))
    )
