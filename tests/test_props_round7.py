"""Property tests for the round-7 exact operators: W1 equals the
brute-force CDF area and obeys the metric laws, HLL registers are
duplication-invariant and merge-exact, PR-curve F1 dominance, and
clustering-coefficient bounds — each against a pure-Python reference
over hypothesis-generated inputs."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

_small_ints = st.integers(min_value=-20, max_value=20)


def _ref_w1(a, b):
    vs = sorted(set(a) | set(b))
    na, nb = len(a), len(b)
    return round(
        sum(
            abs(
                sum(x <= vs[i] for x in a) / na
                - sum(x <= vs[i] for x in b) / nb
            )
            * (vs[i + 1] - vs[i])
            for i in range(len(vs) - 1)
        ),
        6,
    )


class TestW1Props:
    @settings(max_examples=6, deadline=None)
    @given(
        st.lists(_small_ints, min_size=1, max_size=50),
        st.lists(_small_ints, min_size=1, max_size=50),
    )
    @pytest.mark.slow
    def test_equals_brute_area_symmetry_identity(self, a, b):
        from etl_capnz_spark.operators.mlmetrics import w1_drift

        spark = self.spark
        da = spark.createDataFrame([(v,) for v in a], "v long")
        db = spark.createDataFrame([(v,) for v in b], "v long")
        w = w1_drift(da, db, "v").collect()[0]["w1"]
        assert w == _ref_w1(a, b)
        # symmetry
        assert w == w1_drift(db, da, "v").collect()[0]["w1"]
        # identity of indiscernibles on equal multisets
        if sorted(a) == sorted(b):
            assert w == 0.0

    @pytest.fixture(autouse=True)
    def _spark(self, spark):
        self.spark = spark


class TestHllProps:
    @settings(max_examples=5, deadline=None)
    @given(st.lists(st.integers(0, 10_000), min_size=1, max_size=80))
    def test_duplication_invariance_and_merge(self, xs):
        from etl_capnz_spark.operators.frequency import (
            hll_merge,
            hll_registers,
        )

        spark = self.spark
        df = spark.createDataFrame(
            [(str(x),) for x in xs], "v string"
        )
        dup = df.unionByName(df)  # sketch is a SET function
        as_set = lambda d: {
            (r["j"], r["m_j"]) for r in d.collect()
        }
        base = as_set(hll_registers(df, [], "v"))
        assert as_set(hll_registers(dup, [], "v")) == base
        # splitting arbitrarily and max-merging reproduces the sketch
        h1 = df.limit(max(1, len(xs) // 2))
        merged = hll_merge(
            hll_registers(h1, [], "v").unionByName(
                hll_registers(df, [], "v")
            ),
            [],
        )
        assert as_set(merged) == base

    @pytest.fixture(autouse=True)
    def _spark(self, spark):
        self.spark = spark


class TestPrCurveProps:
    @settings(max_examples=5, deadline=None)
    @given(
        st.lists(
            st.tuples(st.integers(0, 15), st.integers(0, 1)),
            min_size=2,
            max_size=60,
        )
    )
    def test_topk_dominates_every_threshold(self, pairs):
        from etl_capnz_spark.operators.mlmetrics import pr_curve_topk

        spark = self.spark
        df = spark.createDataFrame(pairs, "s long, y int")
        rows = pr_curve_topk(df, "s", "y", k=1).collect()
        assert rows
        best = rows[0]
        # brute-force best F1 over all attained thresholds
        brute = 0.0
        for t in sorted({s for s, _ in pairs}):
            tp = sum(1 for s, y in pairs if s >= t and y == 1)
            fp = sum(1 for s, y in pairs if s >= t and y == 0)
            fn = sum(1 for s, y in pairs if s < t and y == 1)
            brute = max(brute, 2.0 * tp / (2.0 * tp + fp + fn))
        assert best["f1"] == round(brute, 6)
        assert 0.0 <= best["f1"] <= 1.0
        assert best["tp"] + best["fn"] == sum(y for _, y in pairs)

    @pytest.fixture(autouse=True)
    def _spark(self, spark):
        self.spark = spark


class TestClusteringProps:
    @settings(max_examples=5, deadline=None)
    @given(
        st.lists(
            st.tuples(st.integers(0, 12), st.integers(0, 12)),
            min_size=1,
            max_size=40,
        )
    )
    def test_bounds_and_corner_sum(self, edges):
        from etl_capnz_spark.operators.graph import (
            clustering_coefficients,
        )

        spark = self.spark
        df = spark.createDataFrame(edges, "u int, v int")
        rows = clustering_coefficients(df).collect()
        # coefficient in [0, 1]; corner sum divisible by 3
        for r in rows:
            assert 0.0 <= r["clustering"] <= 1.0
            assert r["triangles"] >= 0
        assert sum(r["triangles"] for r in rows) % 3 == 0
        # degree-sum = 2 * |canonical edges|
        canon = {
            (min(u, v), max(u, v)) for u, v in edges if u != v
        }
        assert sum(r["degree"] for r in rows) == 2 * len(canon)

    @pytest.fixture(autouse=True)
    def _spark(self, spark):
        self.spark = spark
