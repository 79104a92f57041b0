"""Skew mitigation primitives (SURVEY.md §4.2 'skew handling').

AQE's skew-join splitting covers joins, but two shapes still need manual
salting at 100 TB:

* a groupBy where one key holds a large fraction of all rows (a single
  alert id with millions of features, one hot user in sessionization);
* a broadcast-poisoning hot key on the probe side of a join.

``salted_agg`` implements the classic two-phase rewrite: aggregate on
(key, salt) first — spreading the hot key over ``salt_buckets`` reducers —
then re-aggregate on key. Correct for any algebraic aggregate expressed as
(partial, merge) pairs; the helper takes the common ones by name.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_PARTIAL = {
    "count": lambda c: F.count(c),
    "sum": lambda c: F.sum(c),
    "min": lambda c: F.min(c),
    "max": lambda c: F.max(c),
}
_MERGE = {
    "count": F.sum,  # counts add up
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
}


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 32,
) -> DataFrame:
    """Two-phase salted aggregation.

    ``aggs`` maps output column name → (function name, input column), e.g.
    ``{"n": ("count", "*"), "total": ("sum", "value")}``.

    Phase 1 shuffles on (key, salt) — the hot key spreads over
    ``salt_buckets`` partitions; phase 2 shuffles the tiny partial rows on
    key alone.
    """
    salt = (F.rand(seed=42) * salt_buckets).cast("int").alias("_salt")
    phase1_aggs = []
    for out, (fn, col) in aggs.items():
        c = F.lit(1) if col == "*" else F.col(col)
        phase1_aggs.append(_PARTIAL[fn](c).alias(f"_p_{out}"))
    partial = df.withColumn("_salt", salt).groupBy(*key_cols, "_salt").agg(
        *phase1_aggs
    )
    phase2_aggs = [
        _MERGE[fn](F.col(f"_p_{out}")).alias(out)
        for out, (fn, _) in aggs.items()
    ]
    return partial.groupBy(*key_cols).agg(*phase2_aggs)


def with_salted_key(
    df: DataFrame, key_col: str, hot_keys: list, salt_buckets: int = 16
) -> DataFrame:
    """Join-side salting: append ``#saltN`` to known-hot key values (and a
    replicated dimension built with :func:`explode_hot_dim` on the other
    side) so one key's rows spread over ``salt_buckets`` tasks."""
    is_hot = F.col(key_col).isin(hot_keys)
    salted = F.when(
        is_hot,
        F.concat(
            F.col(key_col).cast("string"),
            F.lit("#"),
            (F.rand(seed=42) * salt_buckets).cast("int").cast("string"),
        ),
    ).otherwise(F.col(key_col).cast("string"))
    return df.withColumn(f"{key_col}_salted", salted)


def explode_hot_dim(
    dim: DataFrame, key_col: str, hot_keys: list, salt_buckets: int = 16
) -> DataFrame:
    """Replicate dimension rows for hot keys across all salt suffixes."""
    suffixes = F.when(
        F.col(key_col).isin(hot_keys),
        F.array(*[F.lit(f"#{i}") for i in range(salt_buckets)]),
    ).otherwise(F.array(F.lit("")))
    return dim.withColumn("_sfx", F.explode(suffixes)).withColumn(
        f"{key_col}_salted",
        F.concat(F.col(key_col).cast("string"), F.col("_sfx")),
    ).drop("_sfx")
