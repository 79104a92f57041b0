"""Data-layout clustering: Z-order (Morton) interleaving for
multi-dimensional file skipping (north-star extension, SURVEY.md §2.12).

Why this is a 100 TB operator: parquet scans prune files (and row
groups) with min/max statistics. Sorting by ONE column makes that
column's ranges tight but leaves every other column's min/max spanning
the whole domain — a 2-D box predicate still touches every file.
Z-ordering interleaves the bits of several quantized columns so rows
close in the multi-dimensional space land in the same files; min/max
ranges are tight in ALL clustered dimensions at once, and a box
predicate overlaps only O(perimeter) files. This is the layout strategy
behind Delta OPTIMIZE ZORDER BY / Iceberg sort orders, built here from
Spark built-ins only.

Relationship to ``sinks/storage.py z_value``: that is the general
per-bit-loop Morton key (any bit width, 2·bits expression nodes);
``zvalue2`` here is the magic-number ("bit spread") form of the SAME
key for the common 16-bit case — 10 bitwise ops per column instead of
64, a much shallower codegen expression tree. The two are pinned
bit-identical in tests/test_layout.py. This module adds what the sink
key alone lacks:

* quantization + bit-spreading is pure JVM bitwise arithmetic
  (``shiftleft`` / ``bitwiseAND`` / ``bitwiseOR`` — whole-stage
  codegen'd, no Python in the row path, and expressible 1:1 in DuckDB
  SQL, so the z-key computation is oracle-exact);
* the layout itself is ``repartitionByRange`` on the z-value (one range
  shuffle — the same cost as any global sort-write) followed by
  ``sortWithinPartitions``, so each output file covers one tight z-range.

``tools/zorder_probe.py`` measures the actual min/max-overlap file
counts for box predicates under z-order vs single-column sort — the
pruning claim is pinned by test, not asserted.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (shift, mask) schedule spreading a 16-bit int so its bits occupy even
# positions of a 32-bit int — the classic "magic numbers" Morton spread.
_SPREAD_16 = [
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
]


def quantize_minmax(col: Column, lo: float, hi: float, bits: int = 16) -> Column:
    """Map a numeric column into [0, 2^bits) by fixed min-max scaling.

    ``lo``/``hi`` are EXPLICIT constants (at scale: from table stats or a
    prior ``describe``) so the mapping is deterministic and
    oracle-checkable — no hidden pass over the data. Values outside
    [lo, hi] clamp to the edge buckets.
    """
    if not 1 <= bits <= 16:
        raise ValueError("bits must be in [1, 16] (zvalue2 interleaves 16)")
    if hi <= lo:
        raise ValueError("hi must be > lo")
    max_code = (1 << bits) - 1
    scaled = (col.cast("double") - F.lit(float(lo))) / F.lit(float(hi - lo))
    clamped = F.least(F.greatest(scaled, F.lit(0.0)), F.lit(1.0))
    return F.least(
        F.floor(clamped * F.lit(float(1 << bits))).cast("long"),
        F.lit(max_code),
    )


def spread_bits16(col: Column) -> Column:
    """Spread the low 16 bits of ``col`` onto even bit positions."""
    x = col.bitwiseAND(F.lit(0xFFFF))
    for shift, mask in _SPREAD_16:
        x = (x.bitwiseOR(F.shiftleft(x, shift))).bitwiseAND(F.lit(mask))
    return x


def zvalue2(x: Column, y: Column) -> Column:
    """Interleave two 16-bit quantized columns into one 32-bit Morton
    key: bit i of x → bit 2i, bit i of y → bit 2i+1."""
    return spread_bits16(x).bitwiseOR(F.shiftleft(spread_bits16(y), 1))


def zorder_write(
    df: DataFrame,
    path: str,
    zcol: Column,
    num_files: int,
) -> None:
    """Write ``df`` clustered by the given z-value into ``num_files``
    range-partitioned, internally-sorted parquet files.

    One range shuffle (sampled range boundaries — same machinery as any
    global sort, AQE-coalescible), then a map-side sort per partition.
    The z column itself is dropped from the files: it is a layout key,
    not data, and is recomputable from its definition.
    """
    (
        df.withColumn("_z", zcol)
        .repartitionByRange(num_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def file_minmax_overlap(
    spark_df: DataFrame,
    cols_bounds: dict[str, tuple[float, float]],
) -> DataFrame:
    """Per-file min/max stats joined against a box predicate — the exact
    information a stats-pruning scan uses. Returns one row per file with
    an ``overlaps`` flag: files a perfect min/max pruner would READ.

    ``spark_df`` must be a fresh read of the layout under test;
    ``cols_bounds`` maps column → (lo, hi) of the box predicate.
    """
    aggs = []
    for c in cols_bounds:
        aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
    per_file = (
        spark_df.withColumn("_file", F.input_file_name())
        .groupBy("_file")
        .agg(*aggs)
    )
    overlap = F.lit(True)
    for c, (lo, hi) in cols_bounds.items():
        overlap = (
            overlap
            & (F.col(f"max_{c}") >= F.lit(lo))
            & (F.col(f"min_{c}") <= F.lit(hi))
        )
    return per_file.withColumn("overlaps", overlap)
