"""Geometry operators G1-G5 (SURVEY.md §2.4) — pure array-HOF expressions.

All of these run inside whole-stage codegen (no Python, no shuffle): the
polygon string parse, validation, ring closure and the shoelace centroid are
per-row array computations. The one aggregation-shaped variant
(``centroid_window``) exists to exercise the engine's window-function path
(SURVEY.md §2.9) and is oracle-checked separately.

Reference semantics (task.ts:255-378), quirks preserved:

* G1 ``parse_polygon``: split on whitespace → ``lat,lon`` pairs → floats.
  A pair is invalid if it lacks a comma, has != 2 parts, blank parts,
  non-numeric parts, or out-of-range lat/lon. ANY invalid pair poisons the
  whole polygon (throw → here NULL, task.ts:303-305); <3 valid points also
  poisons (task.ts:307-309). Points are emitted ``[lon, lat]`` (GeoJSON
  order, task.ts:300); an open ring is closed by appending the first point
  (task.ts:312-314). JS ``parseFloat`` parses a numeric PREFIX
  (``'1.5abc'`` → 1.5) — reproduced via regexp prefix extraction.
* G2 ``parse_circle``: ``"lat,lon radius"`` → center + radius; NULL (not
  poison) on any failure; radius must be > 0 (task.ts:319-338). Radius is
  parsed but the reference only ever uses the center point
  (task.ts:780-788).
* G3 ``centroid``: shoelace signed-area centroid over the closed ring;
  degenerate area (<1e-10) falls back to the arithmetic mean of ALL ring
  points including the duplicated closing point (task.ts:340-378).
* G4: a polygon feature is only emitted when the closed ring has ≥4 points
  (task.ts:656).
* G5: no geometry → Point at NZ centre [174.0, -41.0] (task.ts:791-796).
"""

from __future__ import annotations

from functools import lru_cache

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

NZ_CENTER_LON = 174.0
NZ_CENTER_LAT = -41.0
DEGENERATE_AREA_EPS = 1e-10

# JS parseFloat prefix semantics: leading sign, digits with optional decimal
# point, optional exponent. Empty extraction → NaN (here: NULL).
_FLOAT_PREFIX_RE = r"^[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?"


def js_parse_float(s: Column) -> Column:
    """JS ``parseFloat``: parse the longest numeric prefix, else NULL.

    Fast path: ``try_cast`` (codegen-friendly, no regex) covers every
    well-formed number; the prefix-extraction regex only runs on rows where
    the cast failed (lazy ``coalesce``), preserving the ``'1.5abc'`` → 1.5
    quirk without paying regex cost on clean data.
    """
    t = F.trim(s)
    return F.coalesce(
        t.try_cast("double"),
        F.nullif(F.regexp_extract(t, _FLOAT_PREFIX_RE, 0), F.lit("")).try_cast(
            "double"
        ),
    )


def parse_polygon(polygon_str: Column) -> Column:
    """G1 → ``array<array<double>>`` closed ring of [lon, lat], or NULL.

    NULL means the reference would have thrown (any invalid pair, or fewer
    than 3 valid points) — callers route such alerts to the fallback-point
    branch (F3, task.ts:776-796).

    Expression-shape note (perf, SURVEY.md §8 finding 3): array-HOF lambdas
    are interpreted, so a subtree referenced N times is EVALUATED N times.
    The parse is therefore staged — split → floats → validity — so each
    ``js_parse_float`` runs once per coordinate, and the per-pair array plus
    the filtered point list are let-bound via single-element ``transform``
    so the whole pair parse runs once per row regardless of how many times
    downstream logic references it. Arithmetic and 3-valued-logic structure
    are identical to the naive form — results are bit-exact.
    """
    raw_pairs = F.split(F.trim(polygon_str), r"\s+")
    # Stage 1: split each pair once.
    with_parts = F.transform(raw_pairs, _pair_parts)
    # Stage 2: floats + string-shape test, each computed exactly once.
    floats = F.transform(with_parts, _pair_floats)
    # Reference: pairs WITHOUT a comma and empty-after-split pairs are
    # silently skipped only when falsy — a non-empty comma-less token is
    # invalid (task.ts:269-273). After split on \s+ of a trimmed string no
    # empty tokens remain, so: invalid := any token failing the pair rules.
    parsed = F.transform(floats, _pair_validity)

    def build(ps: Column) -> Column:
        any_invalid = F.exists(ps, lambda p: ~p["valid"])
        points = F.transform(
            F.filter(ps, lambda p: p["valid"]),
            lambda p: F.array(p["lon"], p["lat"]),
        )

        def close(pts: Column) -> Column:
            poisoned = (
                polygon_str.isNull()
                | (F.trim(polygon_str) == "")
                | any_invalid
                | (F.size(pts) < 3)
            )
            return F.when(~poisoned, _close_ring(pts))

        return F.try_element_at(
            F.transform(F.array(points), close), F.lit(1)
        )

    return F.try_element_at(F.transform(F.array(parsed), build), F.lit(1))


def _pair_parts(pair: Column) -> Column:
    return F.struct(
        pair.alias("pair"), F.split(pair, ",", -1).alias("parts")
    )


def _pair_floats(s: Column) -> Column:
    parts = s["parts"]
    lat_str = F.try_element_at(parts, F.lit(1))
    lon_str = F.try_element_at(parts, F.lit(2))
    shape_ok = (
        s["pair"].contains(",")
        & (F.size(parts) == 2)
        & (F.trim(lat_str) != "")
        & (F.trim(lon_str) != "")
    )
    return F.struct(
        js_parse_float(lat_str).alias("lat"),
        js_parse_float(lon_str).alias("lon"),
        shape_ok.alias("shape_ok"),
    )


def _pair_validity(s: Column) -> Column:
    lat = s["lat"]
    lon = s["lon"]
    valid = (
        s["shape_ok"]
        & lat.isNotNull()
        & lon.isNotNull()
        & (lat >= -90)
        & (lat <= 90)
        & (lon >= -180)
        & (lon <= 180)
    )
    return F.struct(lat.alias("lat"), lon.alias("lon"), valid.alias("valid"))


def _close_ring(points: Column) -> Column:
    head = F.try_element_at(points, F.lit(1))
    last = F.try_element_at(points, F.lit(-1))
    is_closed = (head[0] == last[0]) & (head[1] == last[1])
    return F.when(is_closed, points).otherwise(
        F.concat(points, F.array(head))
    )


def parse_circle(circle_str: Column) -> Column:
    """G2 → ``struct<lon:double, lat:double, radius:double>`` or NULL.

    Split on single spaces; first token ``lat,lon``, second radius
    (task.ts:324-333). Failures yield NULL (no poisoning).
    """
    parts = F.split(F.trim(circle_str), " ")
    first = F.try_element_at(parts, F.lit(1))
    latlon = F.split(first, ",", -1)
    lat = js_parse_float(F.try_element_at(latlon, F.lit(1)))
    lon = js_parse_float(F.try_element_at(latlon, F.lit(2)))
    radius = js_parse_float(F.try_element_at(parts, F.lit(2)))
    ok = (
        (F.size(parts) >= 2)
        & (F.size(latlon) >= 2)
        & (F.try_element_at(latlon, F.lit(1)) != "")
        & (F.try_element_at(latlon, F.lit(2)) != "")
        & lat.isNotNull()
        & lon.isNotNull()
        & radius.isNotNull()
        & (lat >= -90)
        & (lat <= 90)
        & (lon >= -180)
        & (lon <= 180)
        & (radius > 0)
    )
    return F.when(
        circle_str.isNotNull() & (F.trim(circle_str) != "") & ok,
        F.struct(lon.alias("lon"), lat.alias("lat"), radius.alias("radius")),
    )


def centroid(ring: Column) -> Column:
    """G3 → ``struct<lon:double, lat:double>`` shoelace centroid of the ring.

    Pure fold over consecutive vertex pairs — no shuffle, codegen-friendly.
    Matches task.ts:340-378 exactly, including the degenerate-area mean
    fallback (over ALL points incl. the closing duplicate) and the <3-point
    [0,0] guard.

    Expression-shape note (perf): the shoelace terms are staged so the
    cross product is computed once per edge, the three sums come out of ONE
    struct-accumulator fold, and every downstream reference reads a
    let-bound stats struct — the naive form re-ran the whole fold per
    reference (~6×). Per-element arithmetic order is unchanged, so the
    doubles are bit-identical.
    """
    n = F.size(ring)
    # Pair consecutive vertices via two slices (cheaper than an indexed
    # fold: HOF lambdas are interpreted, so fewer/simpler lambda bodies win).
    p0s = F.slice(ring, 1, n - 1)
    p1s = F.slice(ring, 2, n - 1)
    edges = F.zip_with(
        p0s, p1s, lambda p, q: F.struct(p.alias("p"), q.alias("q"))
    )
    # Stage 1: cross product once per edge (+ the two coordinate sums).
    halves = F.transform(
        edges,
        lambda e: F.struct(
            (
                e["p"][0] * e["q"][1] - e["q"][0] * e["p"][1]
            ).alias("cross"),
            (e["p"][0] + e["q"][0]).alias("sx"),
            (e["p"][1] + e["q"][1]).alias("sy"),
        ),
    )
    # Stage 2: weight the sums by the (materialized) cross product.
    terms = F.transform(
        halves,
        lambda t: F.struct(
            t["cross"].alias("cross"),
            (t["sx"] * t["cross"]).alias("cx"),
            (t["sy"] * t["cross"]).alias("cy"),
        ),
    )
    sums = F.aggregate(
        terms,
        F.struct(
            F.lit(0.0).alias("a2"),
            F.lit(0.0).alias("cx"),
            F.lit(0.0).alias("cy"),
        ),
        lambda acc, t: F.struct(
            (acc["a2"] + t["cross"]).alias("a2"),
            (acc["cx"] + t["cx"]).alias("cx"),
            (acc["cy"] + t["cy"]).alias("cy"),
        ),
    )
    means = F.aggregate(
        ring,
        F.struct(F.lit(0.0).alias("x"), F.lit(0.0).alias("y")),
        lambda a, p: F.struct(
            (a["x"] + p[0]).alias("x"), (a["y"] + p[1]).alias("y")
        ),
    )
    stats = F.struct(sums.alias("s"), means.alias("m"), n.alias("n"))

    def finish(st: Column) -> Column:
        area = st["s"]["a2"] * F.lit(0.5)
        degenerate = F.abs(area) < F.lit(DEGENERATE_AREA_EPS)
        lon = (
            F.when(st["n"] < 3, F.lit(0.0))
            .when(degenerate, st["m"]["x"] / st["n"])
            .otherwise(st["s"]["cx"] / (F.lit(6.0) * area))
        )
        lat = (
            F.when(st["n"] < 3, F.lit(0.0))
            .when(degenerate, st["m"]["y"] / st["n"])
            .otherwise(st["s"]["cy"] / (F.lit(6.0) * area))
        )
        return F.struct(lon.alias("lon"), lat.alias("lat"))

    return F.try_element_at(F.transform(F.array(stats), finish), F.lit(1))


def centroid_window(df: DataFrame, id_col: str, ring_col: str) -> DataFrame:
    """G3 window-function variant (SURVEY.md §2.9).

    ``posexplode`` the ring, pair consecutive vertices with ``lead() over
    (partition by id order by pos)``, then hash-aggregate the three shoelace
    sums. Same numbers as :func:`centroid`; exists to give the engine a real
    window + aggregation code path with a DuckDB oracle.

    Scale note: the window and groupBy share the same partitioning key, so
    Catalyst reuses one hash-partition exchange of ``id_col`` for both.
    """
    explode_cols, lead_cols, agg_cols, out_cols = _centroid_window_cols(
        id_col, ring_col
    )
    pts = df.select(*explode_cols).select(*lead_cols)
    return pts.groupBy(id_col).agg(*agg_cols).select(*out_cols)


@lru_cache(maxsize=None)
def _centroid_window_cols(id_col: str, ring_col: str) -> tuple:
    """centroid_window's Column tuples, built once per (id, ring) name
    pair per process (opt r10 — same expression-construction-cache
    discipline as operators/features.py)."""
    pts_cols = (
        id_col,
        F.size(ring_col).alias("_n"),
        F.posexplode(ring_col).alias("pos", "pt"),
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    lead_cols = (
        id_col,
        "_n",
        F.col("pt")[0].alias("x0"),
        F.col("pt")[1].alias("y0"),
        F.lead(F.col("pt")[0]).over(w).alias("x1"),
        F.lead(F.col("pt")[1]).over(w).alias("y1"),
    )
    agg_cols = (
        F.sum(F.col("x0") * F.col("y1") - F.col("x1") * F.col("y0")).alias("a2"),
        F.sum(
            (F.col("x0") + F.col("x1"))
            * (F.col("x0") * F.col("y1") - F.col("x1") * F.col("y0"))
        ).alias("cxs"),
        F.sum(
            (F.col("y0") + F.col("y1"))
            * (F.col("x0") * F.col("y1") - F.col("x1") * F.col("y0"))
        ).alias("cys"),
        F.avg("x0").alias("mx"),
        F.avg("y0").alias("my"),
        F.max("_n").alias("n"),
    )
    area = F.col("a2") * F.lit(0.5)
    out_cols = (
        id_col,
        F.when(F.col("n") < 3, F.lit(0.0))
        .when(F.abs(area) < DEGENERATE_AREA_EPS, F.col("mx"))
        .otherwise(F.col("cxs") / (F.lit(6.0) * area))
        .alias("c_lon"),
        F.when(F.col("n") < 3, F.lit(0.0))
        .when(F.abs(area) < DEGENERATE_AREA_EPS, F.col("my"))
        .otherwise(F.col("cys") / (F.lit(6.0) * area))
        .alias("c_lat"),
    )
    return pts_cols, lead_cols, agg_cols, out_cols


def fallback_point() -> Column:
    """G5: NZ-centre Point (task.ts:791-796) as ``struct<lon,lat>``."""
    return F.struct(
        F.lit(NZ_CENTER_LON).alias("lon"), F.lit(NZ_CENTER_LAT).alias("lat")
    )


def point_in_ring(px: Column, py: Column, ring: Column) -> Column:
    """Ray-casting point-in-polygon test over a CLOSED [lon,lat] ring
    (the :func:`parse_polygon` output shape) — crossing parity of a
    horizontal ray from (px, py).

    Pure array-HOF: one filter over the ring's edge indices, O(ring)
    per test with no UDF, so a grid-bucketed candidate join + this
    predicate is the scalable point-in-polygon join (Sedona-class
    surface). The edge test is the classic
    ``(y1 > py) != (y2 > py) AND px < x1 + (x2-x1)(py-y1)/(y2-y1)``;
    the division is guarded by the parity condition (y1 ≠ y2 inside
    the branch). Boundary points follow crossing-parity convention —
    deterministic, and dialect-portable because the oracle runs the
    identical arithmetic.
    """
    edges = F.sequence(F.lit(1), F.size(ring) - 1)

    def crosses(i: Column) -> Column:
        p1 = F.element_at(ring, i)
        p2 = F.element_at(ring, i + 1)
        x1, y1 = F.element_at(p1, 1), F.element_at(p1, 2)
        x2, y2 = F.element_at(p2, 1), F.element_at(p2, 2)
        # CASE guard, not AND: ANSI mode THROWS on double div-by-zero
        # (horizontal edges have y1 == y2) and Spark's And does not
        # short-circuit; CaseWhen branches ARE lazily evaluated
        return F.when(
            (y1 > py) != (y2 > py),
            px < x1 + (x2 - x1) * (py - y1) / (y2 - y1),
        ).otherwise(F.lit(False))

    return F.size(F.filter(edges, crosses)) % 2 == 1


def ring_area(ring: Column) -> Column:
    """Shoelace AREA of a closed ring (degrees² — the coverage-size
    metric an alert dashboard ranks by; multiply by the local
    km²-per-degree² factor for physical area). Same fold skeleton as
    :func:`centroid`: one cross product per edge, one accumulate, no
    shuffle, codegen-friendly; rings with < 3 points are 0.0."""
    n = F.size(ring)
    p0s = F.slice(ring, 1, n - 1)
    p1s = F.slice(ring, 2, n - 1)
    crosses = F.zip_with(
        p0s, p1s, lambda p, q: p[0] * q[1] - q[0] * p[1]
    )
    total = F.aggregate(crosses, F.lit(0.0), lambda acc, x: acc + x)
    return F.when(n >= 3, F.abs(total) / F.lit(2.0)).otherwise(F.lit(0.0))


def dp_reference(
    points: "list[tuple[float, float]]", eps: float
) -> "list[tuple[float, float]]":
    """Pure-Python Douglas-Peucker over an OPEN polyline with fixed
    endpoints — the readable spec for :func:`simplify_rings` and its
    test oracle. Iterative stack (no recursion-depth hazard); keeps
    every point whose perpendicular distance from the current anchor
    chord exceeds ``eps``. Distances compare squared (no sqrt)."""
    n = len(points)
    if n <= 2:
        return list(points)
    keep = [False] * n
    keep[0] = keep[n - 1] = True
    stack = [(0, n - 1)]
    e2 = eps * eps
    while stack:
        a, b = stack.pop()
        ax, ay = points[a]
        bx, by = points[b]
        dx, dy = bx - ax, by - ay
        seg2 = dx * dx + dy * dy
        best, best_d2 = -1, e2
        for i in range(a + 1, b):
            px, py = points[i]
            if seg2 == 0.0:
                d2 = (px - ax) ** 2 + (py - ay) ** 2
            else:
                t = ((px - ax) * dx + (py - ay) * dy) / seg2
                t = 0.0 if t < 0.0 else (1.0 if t > 1.0 else t)
                cx, cy = ax + t * dx, ay + t * dy
                d2 = (px - cx) ** 2 + (py - cy) ** 2
            if d2 > best_d2:
                best, best_d2 = i, d2
        if best >= 0:
            keep[best] = True
            stack.append((a, best))
            stack.append((best, b))
    return [p for i, p in enumerate(points) if keep[i]]


def simplify_rings(
    df: DataFrame,
    ring_col: str,
    eps: float,
) -> DataFrame:
    """Douglas-Peucker ring simplification — the map-tile/rendering
    prep step: a 10 000-vertex coastline alert polygon draws the same
    at tolerance ε with a fraction of the points, and every byte of
    vertex list is payload the feature sink otherwise ships per alert.

    The recursive split is inherently per-geometry imperative → the
    sanctioned Arrow seam (mapInPandas), map-only: no shuffle, rings
    never leave their partition. Closed rings (parse_polygon output)
    simplify as the open polyline first..last-1 with both anchors
    fixed, then re-close — the fixed-anchor convention (the splitting
    variant that re-anchors at extreme points changes which points
    survive, not the ε guarantee). Exactness is pinned against
    :func:`dp_reference` (BPE-style discipline); the ε guarantee
    (every dropped point within ε of the kept chain) is property-
    tested brute-force.

    Degenerate guard: when every interior point falls within ε the DP
    pass keeps only the two anchors, and re-closing would emit the
    3-point zero-area ring [p0, pLast, p0] — below the 4-point closed-
    ring minimum parse_polygon/ring_area enforce everywhere else. In
    that case the interior point FARTHEST from the anchor chord
    (lowest index on ties — deterministic) is retained, so the output
    always honours the ≥4-point closed-ring contract.

    Output: input columns + (n_in, n_out, ring_simple) — ring_simple
    closed again.
    """
    import pandas as pd

    def _chord_d2(pts, i):
        ax, ay = pts[0]
        bx, by = pts[-1]
        px, py = pts[i]
        dx, dy = bx - ax, by - ay
        seg2 = dx * dx + dy * dy
        if seg2 == 0.0:
            return (px - ax) ** 2 + (py - ay) ** 2
        t = ((px - ax) * dx + (py - ay) * dy) / seg2
        t = 0.0 if t < 0.0 else (1.0 if t > 1.0 else t)
        cx, cy = ax + t * dx, ay + t * dy
        return (px - cx) ** 2 + (py - cy) ** 2

    fields = df.schema
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in fields
    ) + ", n_in int, n_out int, ring_simple array<array<double>>"
    cols = [f.name for f in fields]

    def _simplify(batches):
        for pdf in batches:
            n_in, n_out, simple = [], [], []
            for ring in pdf[ring_col]:
                if ring is None or len(ring) < 4:
                    n_in.append(0 if ring is None else len(ring))
                    n_out.append(0 if ring is None else len(ring))
                    simple.append(
                        None if ring is None else [list(p) for p in ring]
                    )
                    continue
                open_pts = [
                    (float(p[0]), float(p[1])) for p in ring[:-1]
                ]
                kept = dp_reference(open_pts, eps)
                if len(kept) == 2 and len(open_pts) >= 3:
                    far = max(
                        range(1, len(open_pts) - 1),
                        key=lambda i: (_chord_d2(open_pts, i), -i),
                    )
                    kept = [open_pts[0], open_pts[far], open_pts[-1]]
                closed = [list(p) for p in kept] + [list(kept[0])]
                n_in.append(len(ring))
                n_out.append(len(closed))
                simple.append(closed)
            out = pdf.copy()
            out["n_in"] = pd.Series(n_in, dtype="int32")
            out["n_out"] = pd.Series(n_out, dtype="int32")
            out["ring_simple"] = simple
            yield out

    return df.select(*cols).mapInPandas(_simplify, out_schema)


GEOHASH_BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def geohash_encode(lat: Column, lon: Column, precision: int = 5) -> Column:
    """Standard geohash encoding as PURE integer-arithmetic expressions
    (no UDF, no loop at runtime — the Python loop below builds a fixed
    codegen-friendly expression tree): quantize lon to ceil(5p/2) bits
    and lat to floor(5p/2), interleave lon-first, emit 5-bit groups
    through the geohash base32 alphabet. The classic closed form —
    floor((lon+180)/360 * 2^n) — replaces the textbook bisection loop,
    so the oracle can replay it as the same arithmetic. Out-of-range
    inputs clip to the edge cell (lon=180 belongs to the last cell).

    Geohash cells are the equi-join discipline for spatial data: a
    shared prefix IS the bucket key, so neighbor search / spatial
    dedup becomes a groupBy/join on substrings — never a distance
    cross-product.
    """
    bits = 5 * precision
    n_lon = (bits + 1) // 2
    n_lat = bits // 2
    x = F.least(
        F.greatest(
            F.floor((lon + F.lit(180.0)) / F.lit(360.0) * F.lit(1 << n_lon))
            .cast("bigint"),
            F.lit(0),
        ),
        F.lit((1 << n_lon) - 1),
    )
    y = F.least(
        F.greatest(
            F.floor((lat + F.lit(90.0)) / F.lit(180.0) * F.lit(1 << n_lat))
            .cast("bigint"),
            F.lit(0),
        ),
        F.lit((1 << n_lat) - 1),
    )
    total = F.lit(0).cast("bigint")
    for i in range(n_lon):  # lon occupies even positions from the top
        bit = F.shiftright(x, n_lon - 1 - i).bitwiseAND(F.lit(1))
        total = total + bit * F.lit(1 << (bits - 1 - 2 * i))
    for i in range(n_lat):  # lat the odd positions
        bit = F.shiftright(y, n_lat - 1 - i).bitwiseAND(F.lit(1))
        total = total + bit * F.lit(1 << (bits - 1 - (2 * i + 1)))
    alphabet = F.array(*[F.lit(c) for c in GEOHASH_BASE32])
    chars = [
        F.element_at(
            alphabet,
            (
                F.shiftright(total, 5 * (precision - 1 - k)).bitwiseAND(
                    F.lit(31)
                )
                + F.lit(1)
            ).cast("int"),
        )
        for k in range(precision)
    ]
    return F.concat(*chars)
