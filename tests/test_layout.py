"""Z-order layout: Morton key correctness + measured min/max file
pruning vs a single-column sort."""

import numpy as np
import pytest

from pyspark.sql import functions as F

from etl_capnz_spark.operators.layout import (
    file_minmax_overlap,
    quantize_minmax,
    spread_bits16,
    zorder_write,
    zvalue2,
)


def _morton_ref(x: int, y: int) -> int:
    z = 0
    for i in range(16):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_zvalue_matches_bitwise_reference(spark):
    rng = np.random.RandomState(7)
    pts = [(int(x), int(y)) for x, y in rng.randint(0, 1 << 16, size=(200, 2))]
    df = spark.createDataFrame(pts, "x long, y long")
    got = (
        df.withColumn("z", zvalue2(F.col("x"), F.col("y")))
        .orderBy("x", "y")
        .collect()
    )
    for r in got:
        assert r["z"] == _morton_ref(r["x"], r["y"]), (r["x"], r["y"])


def test_spread_bits_even_positions(spark):
    df = spark.createDataFrame([(0xFFFF,), (0x0001,), (0x8000,)], "v long")
    out = {r["v"]: r["s"] for r in df.withColumn("s", spread_bits16(F.col("v"))).collect()}
    assert out[0x0001] == 0x1
    assert out[0x8000] == 0x40000000
    assert out[0xFFFF] == 0x55555555


def test_quantize_clamps_and_scales(spark):
    df = spark.createDataFrame([(-5.0,), (0.0,), (50.0,), (100.0,), (200.0,)], "v double")
    out = [
        r["q"]
        for r in df.withColumn(
            "q", quantize_minmax(F.col("v"), 0.0, 100.0, bits=8)
        ).collect()
    ]
    assert out[0] == 0  # clamp low
    assert out[1] == 0
    assert out[2] == 128  # midpoint
    assert out[3] == 255  # hi edge clamps to max code
    assert out[4] == 255  # clamp high


def test_zorder_prunes_more_files_than_linear_sort(spark, tmp_path):
    """The actual pruning claim, measured: a 2-D box predicate overlaps
    fewer files' min/max ranges under z-order than under a 1-D sort of
    the same data into the same file count.

    Data: 20k points deterministically pseudo-uniform in [0, 2^16)^2
    (hash-derived, so the test is exactly reproducible). Box = lowest
    quarter of x × lowest tenth of y: a 1-D sort on x keeps x-ranges
    tight but every file spans all of y, so ~1/4 of files overlap;
    z-order files cover compact 2-D tiles, so only the files along the
    box (~2.5% of area + boundary) overlap."""
    df = (
        spark.range(20_000)
        .withColumn("x", F.pmod(F.xxhash64(F.col("id"), F.lit(1)), F.lit(1 << 16)))
        .withColumn("y", F.pmod(F.xxhash64(F.col("id"), F.lit(2)), F.lit(1 << 16)))
    )
    z = zvalue2(F.col("x"), F.col("y"))
    n_files = 32
    zpath, lpath = str(tmp_path / "zorder"), str(tmp_path / "linear")
    zorder_write(df, zpath, z, n_files)
    (
        df.repartitionByRange(n_files, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(lpath)
    )
    box = {
        "x": (0.0, (1 << 16) / 4.0),
        "y": (0.0, (1 << 16) / 10.0),
    }
    z_stats = file_minmax_overlap(spark.read.parquet(zpath), box).toPandas()
    l_stats = file_minmax_overlap(spark.read.parquet(lpath), box).toPandas()
    z_read = int(z_stats["overlaps"].sum())
    l_read = int(l_stats["overlaps"].sum())
    assert z_read < l_read, (z_read, l_read)
    # and the layouts are lossless
    assert spark.read.parquet(zpath).count() == 20_000
    assert spark.read.parquet(lpath).count() == 20_000


def test_zvalue2_matches_storage_z_value(spark):
    """The magic-number spread is the SAME Morton key as the general
    per-bit loop in sinks/storage.py — pinned bit-identical."""
    from etl_capnz_spark.sinks.storage import z_value

    rng = np.random.RandomState(3)
    pts = [(int(x), int(y)) for x, y in rng.randint(0, 1 << 16, size=(100, 2))]
    df = spark.createDataFrame(pts, "x long, y long")
    out = df.select(
        zvalue2(F.col("x"), F.col("y")).alias("a"),
        z_value(F.col("x"), F.col("y"), 16).alias("b"),
    ).collect()
    assert all(r["a"] == r["b"] for r in out)
