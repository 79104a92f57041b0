"""Property tests for the round-4 operators: line dedup invariants,
heavy-hitters ≡ naive on random data, CMS over-estimate bound, Bloom
no-false-negative, Morton round-trip."""

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from etl_capnz_spark.operators.dedup import line_dedup_global
from etl_capnz_spark.operators.frequency import heavy_hitters_exact


# A tiny line alphabet so cross-doc collisions are common. Long lines
# (dedupable) and short lines (always kept) both appear.
_LONG = [f"this is repeated boilerplate line number {i} padded out" for i in range(4)]
_SHORT = ["a", "bb", ""]
_line = st.sampled_from(_LONG + _SHORT)
_doc = st.lists(_line, min_size=0, max_size=6).map("\n".join)


class TestLineDedupProps:
    @settings(max_examples=8, deadline=None)
    @given(st.lists(_doc, min_size=1, max_size=6))
    def test_idempotent_and_conservative(self, docs):
        spark = self.spark
        df = spark.createDataFrame(
            list(enumerate(docs)), "doc_id long, text string"
        )
        once = line_dedup_global(df, "text", "doc_id", min_chars=30)
        once_rows = {r["doc_id"]: r["text"] for r in once.collect()}
        # idempotent: a second pass changes nothing
        twice = line_dedup_global(once, "text", "doc_id", min_chars=30)
        assert {r["doc_id"]: r["text"] for r in twice.collect()} == once_rows
        # document set preserved
        assert set(once_rows) == set(range(len(docs)))
        # conservation: no line is invented, and every long line that
        # occurred in the input survives EXACTLY once corpus-wide
        in_long = set()
        for d in docs:
            for ln in d.split("\n"):
                if len(ln) >= 30:
                    in_long.add(ln)
        out_long = []
        for t in once_rows.values():
            for ln in (t.split("\n") if t else []):
                if len(ln) >= 30:
                    out_long.append(ln)
        assert sorted(set(out_long)) == sorted(in_long)
        assert len(out_long) == len(set(out_long))

    @pytest.fixture(autouse=True)
    def _spark(self, spark):
        self.spark = spark


class TestHeavyHittersProps:
    @settings(max_examples=6, deadline=None)
    @given(
        st.lists(st.integers(min_value=0, max_value=12), min_size=1, max_size=400),
        st.integers(min_value=1, max_value=8),
    )
    def test_equals_naive(self, vals, k):
        spark = self.spark
        df = spark.createDataFrame([(v,) for v in vals], "key long").repartition(4)
        got = {
            r["item"]: r["cnt"]
            for r in heavy_hitters_exact(df, "key", k).collect()
        }
        vc = pd.Series(vals).value_counts()
        expect = {
            int(i): int(c) for i, c in vc.items() if c * (k + 1) > len(vals)
        }
        assert got == expect

    @pytest.fixture(autouse=True)
    def _spark(self, spark):
        self.spark = spark


def test_morton_round_trip(spark):
    """zvalue2 is a bijection: de-interleaving the key recovers the
    inputs exactly — layout keys never conflate distinct points."""
    from etl_capnz_spark.operators.layout import zvalue2

    rng = np.random.RandomState(11)
    pts = [(int(x), int(y)) for x, y in rng.randint(0, 1 << 16, size=(300, 2))]
    df = spark.createDataFrame(pts, "x long, y long")
    rows = df.select("x", "y", zvalue2(F.col("x"), F.col("y")).alias("z")).collect()

    def deinterleave(z):
        x = y = 0
        for i in range(16):
            x |= ((z >> (2 * i)) & 1) << i
            y |= ((z >> (2 * i + 1)) & 1) << i
        return x, y

    for r in rows:
        assert deinterleave(r["z"]) == (r["x"], r["y"])


def test_cms_overestimate_on_random(spark):
    from etl_capnz_spark.operators.frequency import cms_build, cms_estimate

    rng = np.random.RandomState(5)
    vals = [f"v{int(v)}" for v in rng.zipf(1.5, 3000) % 200]
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    est = {
        r["item"]: r["est"]
        for r in cms_estimate(
            cms_build(df, "v", depth=4, width=32), df.distinct(), "v", 4, 32
        ).collect()
    }
    truth = pd.Series(vals).value_counts()
    assert set(est) == set(truth.index)
    for item, t in truth.items():
        assert est[item] >= int(t), item
