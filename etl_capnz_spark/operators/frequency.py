"""Frequent-item (heavy-hitter) operators — bounded-memory candidate
generation + exact verification (north-star extension, SURVEY.md §2.12).

The reference engine has no frequency surface; this is the
training-data-pipeline extension (hot-key diagnosis before a shuffle,
boilerplate-domain detection, vocabulary pruning). The design is the
standard two-pass *exact* heavy-hitters algorithm:

1. **Candidate pass — Misra-Gries summaries per partition.** Each input
   partition is streamed through a Misra-Gries sketch with ``k``
   counters (``mapInPandas`` iterator: state is a dict of ≤ k entries,
   independent of partition size — THE property that matters at 100 TB,
   where a partition may hold 10^8 rows but the sketch stays k entries).
   Batches are folded in with the mergeable-summaries rule (Agarwal et
   al., "Mergeability of Summaries", PODS'12): add batch counts, then if
   more than k items remain subtract the (k+1)-th largest count from all
   and drop non-positives. Guarantee: any item with partition frequency
   > n_p/(k+1) survives in that partition's summary, so (pigeonhole)
   any item with GLOBAL frequency > n/(k+1) survives in at least one
   partition summary — the union of summaries is a certified candidate
   superset. Candidate volume ≤ k × num_partitions rows, tiny.

2. **Exact pass — one scan, candidate-keyed aggregation.** The candidate
   set is broadcast; every row maps to its own key if it is a candidate
   else to a single ``__other__`` sink key, then one partial-agg count.
   The shuffle carries ≤ k·P + 1 keys per map task — never the raw
   value domain. Total row count n comes from the same aggregation
   (sum of all counts), so the whole operator is exactly TWO scans and
   one tiny shuffle, with per-executor state bounded by k.

The final output — items with exact count, filtered to
``count · (k+1) > n`` — is *provably identical* to the naive
``GROUP BY item HAVING count(*) > n/(k+1)`` (that equivalence IS the
DuckDB oracle check), but the naive form shuffles the full value domain
and is exactly what you cannot run on a 10^11-distinct-key corpus.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _mg_fold(counters: dict, batch_counts: "pd.Series", k: int) -> None:
    """Fold a batch's value counts into a Misra-Gries summary in place."""
    for item, cnt in batch_counts.items():
        counters[item] = counters.get(item, 0) + int(cnt)
    if len(counters) > k:
        # subtract the (k+1)-th largest count from everything; ≤ k survive
        decrement = sorted(counters.values(), reverse=True)[k]
        for item in list(counters):
            remaining = counters[item] - decrement
            if remaining > 0:
                counters[item] = remaining
            else:
                del counters[item]


def misra_gries_candidates(df: DataFrame, col: str, k: int) -> DataFrame:
    """Per-partition Misra-Gries summaries, unioned.

    Returns columns ``(item, mg_count)`` with ≤ k rows per input
    partition. ``mg_count`` is the (under-)estimate the sketch carries —
    it is NOT an exact count (use :func:`heavy_hitters_exact`); it is
    exposed because the decremented counts are what you'd feed a
    second-level merge on a 1000-executor tree.
    """

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        for pdf in batches:
            _mg_fold(counters, pdf[col].value_counts(), k)
        yield pd.DataFrame(
            {"item": list(counters.keys()), "mg_count": list(counters.values())}
        )

    item_type = df.schema[col].dataType.simpleString()
    return df.select(col).mapInPandas(
        summarize, schema=f"item {item_type}, mg_count long"
    )


def heavy_hitters_exact(df: DataFrame, col: str, k: int) -> DataFrame:
    """Exact heavy hitters: items with ``count(*) · (k+1) > n`` and their
    EXACT counts, computed with per-executor state bounded by ``k``.

    Two passes: Misra-Gries candidate superset (certified — no heavy
    item can be missed), then one candidate-keyed exact count where all
    non-candidates collapse into a single sink key. Output columns
    ``(item, cnt)`` — identical to the naive full group-by + HAVING over
    the NON-NULL items, with the shuffle never carrying the raw value
    domain.

    NULL contract, explicitly: NULL rows COUNT toward the total ``n``
    (the threshold denominator) but NULL itself is never reported as a
    heavy hitter — unlike a bare GROUP BY, which would emit a NULL
    group. If NULL frequency matters, count it separately with one
    ``count_if(col IS NULL)``.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    candidates = (
        misra_gries_candidates(df, col, k)
        .select(F.col("item").alias(col))
        .distinct()
        .withColumn("_is_cand", F.lit(True))
    )
    flagged = df.select(col).join(F.broadcast(candidates), on=col, how="left")
    counted = (
        flagged.groupBy(
            F.when(F.col("_is_cand"), F.col(col)).alias("item")
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # total n as an unpartitioned window over the ALREADY-AGGREGATED
    # counts (≤ k·P+1 rows): one pass, no self-join — the plan contains
    # the data scan exactly twice (candidates + exact count), with no
    # reliance on AQE exchange reuse to dedupe a total-n branch. A
    # global window is normally a scale smell; here its input is the
    # key-bounded aggregate, never the data.
    from pyspark.sql.window import Window

    from .rank import bounded_const_key

    n = F.sum("cnt").over(
        Window.partitionBy(bounded_const_key(F.col("item")))
    )
    return (
        counted.withColumn("_n", n)
        .filter(F.col("item").isNotNull() & (F.col("cnt") * (k + 1) > F.col("_n")))
        .select("item", "cnt")
    )


# --------------------------------------------------------------- count-min
def _cms_hash(col: Column, row: int, width: int) -> Column:
    """Row-``row`` counter index: first 52 bits of md5(row || value) mod
    width — the repo's standard dialect-portable hash (identical in
    DuckDB, so the whole sketch is oracle-exact)."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(str(row) + ":"), col)), 1, 13), 16, 10
    ).cast("long")
    return h % width


def _cms_cells(col: Column, depth: int, width: int) -> Column:
    """The (i, j) cell addresses of a value, as a depth-element
    struct array — the ONE definition both cms_build and cms_estimate
    address cells through (a drifted copy would probe wrong cells)."""
    return F.array(
        *[
            F.struct(
                F.lit(i).alias("i"), _cms_hash(col, i, width).alias("j")
            )
            for i in range(depth)
        ]
    )


def cms_build(
    df: DataFrame, col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """Count-min sketch of a string column as a SPARSE counter table
    ``(i, j, cnt)`` — row i ∈ [0, depth), column j = H_i(value) mod
    width, cnt = how many input rows hashed there. Zero cells are simply
    absent.

    This is the mergeable-partials shape shared with partial_rollup/KMV:
    ``cms_merge(cms_build(a), cms_build(b)) == cms_build(a ∪ b)``
    exactly, because counters are sums. Size is ≤ depth × width rows no
    matter the input — the whole point: at 100 TB the sketch an executor
    ships is a few KB, and a day×day rollup of sketches supports
    frequency queries over any window union without re-scanning.

    One narrow pass: explode ``depth`` (i, j) keys per row (tiny ints,
    never the value), one partial-agg count — map-side combine collapses
    to ≤ depth·width cells per task before the shuffle.
    """
    if depth < 1 or width < 1:
        raise ValueError("depth and width must be >= 1")
    return (
        df.select(F.explode(_cms_cells(F.col(col), depth, width)).alias("c"))
        .groupBy(F.col("c.i").alias("i"), F.col("c.j").alias("j"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two sketches built with the same (depth, width): cell-wise
    sum. Associative/commutative — safe to tree-combine across shards."""
    return (
        a.unionByName(b).groupBy("i", "j").agg(F.sum("cnt").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    items: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Point-frequency estimates for ``items[col]`` against a sketch:
    est = min over rows i of counter[i][H_i(item)] (missing cell = 0).
    Never underestimates the true count; collisions only inflate.

    Plan shape: items fan out to ``depth`` (i, j) probes, equi-join the
    (broadcastable, ≤ depth·width-row) sketch, min-agg back per item —
    no full-data rescan, which is why you built the sketch.
    """
    probes = items.select(
        F.col(col).alias("item"),
        F.explode(_cms_cells(F.col(col), depth, width)).alias("p"),
    ).select("item", F.col("p.i").alias("i"), F.col("p.j").alias("j"))
    return (
        probes.join(F.broadcast(sketch), on=["i", "j"], how="left")
        .groupBy("item")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )


# ------------------------------------------------------------- hyperloglog
# Flajolet–Fusy–Gandouet–Meunier (AofA'07) register sketch — the
# industry-standard mergeable distinct-count primitive, complementing
# audit.kmv_sketch (bottom-k minima, sum-free merge) with the fixed-m
# register/max shape every warehouse HLL column stores. The reference
# engine has no sketch surface (north-star extension, SURVEY.md §2.12);
# what matters at 100 TB is that a group's sketch is AT MOST ``m`` rows
# no matter how many rows/distincts feed it, partial-aggregates
# map-side (max), and a day×day rollup merges by register max without
# re-scanning — exactly the count_distinct that does NOT need the raw
# key domain shuffled.
#
# Determinism discipline (the cms/kmv precedent): the hash is the
# repo-standard 52-bit md5 prefix (identical in DuckDB), the harmonic
# sum is kept as an EXACT INTEGER (each register contributes
# 2^(45 − M_j), empties 2^45 — max term 2^45, ≤ m terms, < 2^53, so a
# bigint sum has no float partition-order hazard), and the estimate is
# ONE float division by that integer (plus one ln in the
# linear-counting branch) — bit-identical across engines.

HLL_P = 8  # m = 256 registers: std err 1.04/sqrt(m) ≈ 6.5 %
_HLL_M = 1 << HLL_P
_HLL_W_BITS = 52 - HLL_P  # hash bits left after the register index
_HLL_RHO_MAX = _HLL_W_BITS + 1
# alpha_m · m² · 2^ρmax (the harmonic sum below is scaled by 2^ρmax:
# each register contributes 2^(ρmax − M_j)): ONE Python-computed
# literal embedded identically in the Spark expression and the oracle
# SQL, so the only cross-engine float op is the final division.
HLL_ALPHA_NUM = (
    0.7213
    / (1.0 + 1.079 / _HLL_M)
    * _HLL_M
    * _HLL_M
    * float(1 << _HLL_RHO_MAX)
)


def hll_registers(
    df: DataFrame, group_cols: list[str], value_col: str
) -> DataFrame:
    """Per-group HLL register table: group_cols + (j, m_j).

    j = low ``HLL_P`` bits of the 52-bit md5 hash; ρ = position of the
    highest set bit of the remaining ``_HLL_W_BITS``-bit word counted
    from the top (leading zeros + 1; all-zero word → ρ_max), computed
    as ``45 − length(bin(w))`` — ``bin`` drops leading zeros in Spark
    and DuckDB alike, which is what makes the oracle replay exact.
    m_j = max ρ seen in the register. One narrow projection + one
    hash-agg whose partial max collapses each map task to ≤ m rows per
    group before the shuffle; the raw value domain never shuffles.
    """
    h = F.conv(
        F.substring(F.md5(F.col(value_col).cast("string")), 1, 13), 16, 10
    ).cast("bigint")
    w = F.shiftright(F.col("_h"), HLL_P)
    rho = F.when(w == 0, F.lit(_HLL_RHO_MAX)).otherwise(
        F.lit(_HLL_RHO_MAX) - F.length(F.bin(w))
    )
    return (
        # NULL is not a value (count_distinct semantics): unfiltered,
        # md5(NULL) -> NULL would mint a phantom j=NULL register that
        # inflates the occupancy count and skews v_zero
        df.filter(F.col(value_col).isNotNull())
        .select(*group_cols, h.alias("_h"))
        .select(
            *group_cols,
            (F.col("_h") % _HLL_M).alias("j"),
            rho.alias("_rho"),
        )
        .groupBy(*group_cols, "j")
        .agg(F.max("_rho").alias("m_j"))
    )


def hll_merge(regs: DataFrame, group_cols: list[str]) -> DataFrame:
    """Union of sketches = register-wise max. Associative, commutative,
    idempotent — merge(sketch(A), sketch(B)) == sketch(A ∪ B) EXACTLY
    (not approximately), pinned in tests. ``group_cols`` is the
    post-merge grain (pass fewer columns than the input grain to roll
    up, e.g. per-day sketches → one global sketch)."""
    return regs.groupBy(*group_cols, "j").agg(F.max("m_j").alias("m_j"))


def hll_estimate(regs: DataFrame, group_cols: list[str]) -> DataFrame:
    """Cardinality estimate per group from a register table:
    group_cols + (v_zero, harmonic_sum, est_distinct).

    harmonic_sum = Σ_j 2^(45 − M_j) with absent registers at 2^45 — the
    exact-integer form of m·Σ 2^(−M_j). est = α·m²·2^45 / harmonic_sum,
    with the standard linear-counting fallback m·ln(m/V) when the raw
    estimate ≤ 2.5m and V > 0 empty registers remain (the 32-bit
    large-range correction is irrelevant at a 52-bit hash and is
    omitted). The group agg is over ≤ m rows per group — driver-safe at
    any input scale.
    """
    g = regs.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("_cnt"),
        F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), {_HLL_RHO_MAX} - m_j)")
        ).alias("_s_present"),
    )
    v_zero = (F.lit(_HLL_M) - F.col("_cnt")).cast("bigint")
    s = (
        F.col("_s_present")
        + v_zero * F.lit(1 << _HLL_RHO_MAX).cast("bigint")
    ).cast("bigint")
    raw = F.lit(HLL_ALPHA_NUM) / F.col("harmonic_sum")
    lc = F.lit(float(_HLL_M)) * F.log(
        F.lit(float(_HLL_M)) / F.col("v_zero")
    )
    return (
        g.select(
            *group_cols,
            v_zero.alias("v_zero"),
            s.alias("harmonic_sum"),
        )
        .withColumn(
            "est_distinct",
            F.when(
                (raw <= F.lit(2.5 * _HLL_M)) & (F.col("v_zero") > 0), lc
            ).otherwise(raw),
        )
    )
