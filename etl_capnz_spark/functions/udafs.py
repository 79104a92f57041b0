"""Pandas UDAFs (grouped-aggregate pandas UDFs) — the last cell of the
Python-on-Spark API matrix (scalar pandas_udf, mapInPandas/Arrow,
applyInPandas/Arrow, applyInPandasWithState, UDTF are covered
elsewhere). A grouped-agg pandas UDF receives each group's column as
ONE pandas Series and returns a scalar; Spark runs it inside
groupBy().agg() with the normal two-phase hash-aggregate partitioning
(the group's rows co-locate via the agg exchange, then Arrow hands the
column slice to Python once per group).

Scale note: unlike the built-in JVM aggregates there is NO partial
aggregation — the full group's values cross the Arrow boundary. That
is the honest cost of any exact order-statistics aggregate (you cannot
trim a distribution from partial sums); bound it by grouping keys with
bounded cardinality-per-group, exactly like percentile().
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F


def trimmed_mean_udaf(k: int):
    """Factory: a grouped-agg pandas UDF computing the k-trimmed mean —
    drop the k smallest and k largest values, average the rest (the
    robust location estimate dashboards want when a handful of outliers
    wreck a plain mean). Groups with ≤ 2k rows return NULL rather than
    an average of nothing.

    The set of surviving values is order-statistic-exact, so the DuckDB
    oracle (row_number window + range filter + avg) matches to float
    rounding."""
    if k < 0:
        raise ValueError("k must be >= 0")

    @F.pandas_udf("double")
    def trimmed_mean(v: pd.Series) -> float:
        s = v.dropna().sort_values()
        if len(s) <= 2 * k:
            return None
        kept = s.iloc[k : len(s) - k] if k else s
        return float(kept.mean())

    return trimmed_mean


def midrange_udaf() -> "callable":
    """Grouped-agg pandas UDF: (min+max)/2 — deliberately simple, used
    by tests to pin the UDAF plumbing against the equivalent built-in
    expression (min()+max())/2 exactly."""

    @F.pandas_udf("double")
    def midrange(v: pd.Series) -> float:
        s = v.dropna()
        if s.empty:
            return None
        return float((s.min() + s.max()) / 2.0)

    return midrange
