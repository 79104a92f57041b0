"""Bloom-filter membership pre-filter (north-star extension, §2.12).

The 100 TB use-case: cross-corpus exact dedup against a multi-billion-row
ingested base. The plain plan — shuffle-join every new content hash
against the base — moves the whole base through a shuffle even when 99%
of new docs are NOT duplicates. A Bloom filter over the base hashes is a
few MB of mergeable bitmap; broadcast it and most new rows are proven
novel WITHOUT touching the base table, so the expensive exact join runs
only on the small maybe-duplicate slice. Because a Bloom filter has **no
false negatives**, prefilter + exact join is *provably identical* to the
plain exact join — that equivalence IS the DuckDB oracle check for
``dedup_bloom_prefilter``.

Construction is the mergeable-sketch shape used across this repo (KMV,
Misra-Gries, rollup partials): one bounded-size partial per partition
(an m-bit bitmap built with numpy, streamed batch-by-batch through
``mapInPandas`` so executor state is m/8 bytes regardless of partition
row count), then an associative merge (bitwise OR) via ``treeReduce`` —
log-depth, so 10^5 partitions never funnel through one reducer. Hashing
is vectorized ``pandas.util.hash_array`` (64-bit SipHash-like, keyed),
double-hashed into ``num_hashes`` probe positions (Kirsch-Mitzenmacher).

Sizing: m bits / n items / h hashes → FPR ≈ (1 - e^{-hn/m})^h; the
default 2^20 bits @ 4 hashes holds ~130k items at ~2.4% FPR. At 10^10
base rows you'd shard the filter by hash prefix (each executor holds the
shard for its hash range) — the bitmap OR-merge and the no-false-negative
contract are unchanged.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType


def _hash_keys(seed: int) -> tuple[str, str]:
    """Two independent 16-byte keys for pandas.util.hash_array."""
    k1 = (f"bloom-h1-{seed:06d}" + "0" * 16)[:16]
    k2 = (f"bloom-h2-{seed:06d}" + "0" * 16)[:16]
    return k1, k2


def _positions(
    values: np.ndarray, num_bits: int, num_hashes: int, seed: int
) -> np.ndarray:
    """(len(values), num_hashes) int64 bit positions via double hashing."""
    k1, k2 = _hash_keys(seed)
    vals = values.astype(object)
    h1 = pd.util.hash_array(vals, hash_key=k1).astype(np.uint64)
    h2 = pd.util.hash_array(vals, hash_key=k2).astype(np.uint64)
    # h2 forced odd so probe steps cycle the full power-of-two table
    h2 = h2 | np.uint64(1)
    i = np.arange(num_hashes, dtype=np.uint64)
    return ((h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(num_bits)).astype(
        np.int64
    )


def build_bloom(
    df: DataFrame,
    col: str,
    num_bits: int = 1 << 20,
    num_hashes: int = 4,
    seed: int = 7,
) -> bytes:
    """Build an m-bit Bloom filter over a string column; returns the
    packed bitmap (``num_bits // 8`` bytes).

    One partial bitmap per partition (bounded executor state), merged
    with a log-depth bitwise-OR ``treeReduce``. The driver holds exactly
    one bitmap — never the values.
    """
    if num_bits % 8 or num_bits <= 0:
        raise ValueError("num_bits must be a positive multiple of 8")
    if num_hashes < 1:
        raise ValueError("num_hashes must be >= 1")

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bits = np.zeros(num_bits // 8, dtype=np.uint8)
        for pdf in batches:
            vals = pdf[col].dropna().to_numpy()
            if len(vals):
                pos = _positions(vals, num_bits, num_hashes, seed).ravel()
                np.bitwise_or.at(bits, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
        yield pd.DataFrame({"bitmap": [bits.tobytes()]})

    partials = df.select(col).mapInPandas(partial, schema="bitmap binary")
    rdd = partials.rdd.map(lambda r: np.frombuffer(r.bitmap, dtype=np.uint8))
    # treeAggregate with a zero seed: one job, and the zero-partition
    # input (e.g. an empty first batch) degenerates to the empty bitmap
    # without a separate isEmpty() pre-pass
    zero = np.zeros(num_bits // 8, dtype=np.uint8)
    return rdd.treeAggregate(zero, np.bitwise_or, np.bitwise_or).tobytes()


def bloom_might_contain(
    spark_col: Column,
    bloom: bytes,
    num_bits: int,
    num_hashes: int = 4,
    seed: int = 7,
) -> Column:
    """Vectorized membership probe (pandas UDF). False positives at the
    sized FPR; false negatives NEVER — downstream exact verification may
    rely on that.

    The bitmap ships as a Spark BROADCAST, not a closure capture: a
    production-sized filter (2^30 bits = 128 MB) pickled into every
    task closure would be re-serialized per task; the broadcast is
    torrent-distributed once per executor."""
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    # capture EITHER the broadcast handle OR (no-session fallback) the
    # bytes — never both, or the raw bytes would ride the closure anyway
    payload = (
        spark.sparkContext.broadcast(bloom) if spark is not None else bloom
    )

    @F.pandas_udf(BooleanType())
    def probe(s: pd.Series) -> pd.Series:
        data = payload.value if hasattr(payload, "value") else payload
        bits = np.frombuffer(data, dtype=np.uint8)
        vals = s.to_numpy()
        if not len(vals):
            return pd.Series([], dtype=bool)
        pos = _positions(vals, num_bits, num_hashes, seed)
        hit = (bits[pos >> 3] & (np.uint8(1) << (pos & 7).astype(np.uint8))) != 0
        return pd.Series(hit.all(axis=1))

    return probe(spark_col)


def bloom_prefilter_new_docs(
    new_df: DataFrame,
    base_df: DataFrame,
    text_col: str,
    id_col: str,
    num_bits: int = 1 << 20,
    num_hashes: int = 4,
    seed: int = 7,
) -> DataFrame:
    """Cross-corpus exact dedup with a Bloom pre-filter: rows of
    ``new_df`` whose text does NOT appear in ``base_df``.

    Rows the filter proves novel skip the join entirely; only the
    maybe-duplicate slice (true dups + FPR·novel) is anti-joined against
    the base on the 128-bit content hash. Output is provably identical
    to the plain anti-join — the Bloom filter only removes rows from the
    JOIN, never from the result.
    """
    h_new = new_df.withColumn("_h", F.md5(F.col(text_col)))
    h_base = base_df.select(F.md5(F.col(text_col)).alias("_h")).distinct()
    bloom = build_bloom(h_base, "_h", num_bits, num_hashes, seed)
    flagged = h_new.withColumn(
        "_maybe", bloom_might_contain(F.col("_h"), bloom, num_bits, num_hashes, seed)
    )
    definitely_new = flagged.filter(~F.col("_maybe"))
    verified_new = flagged.filter(F.col("_maybe")).join(
        h_base, on="_h", how="left_anti"
    )
    return (
        definitely_new.unionByName(verified_new)
        .drop("_h", "_maybe")
    )
