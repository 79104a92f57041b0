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
    """
    raw_pairs = F.split(F.trim(polygon_str), r"\s+")
    # Per-pair parse into struct(lat, lon, valid).
    parsed = F.transform(raw_pairs, _parse_pair)
    # Reference: pairs WITHOUT a comma and empty-after-split pairs are
    # silently skipped only when falsy — a non-empty comma-less token is
    # invalid (task.ts:269-273). After split on \s+ of a trimmed string no
    # empty tokens remain, so: invalid := any token failing the pair rules.
    any_invalid = F.exists(parsed, lambda p: ~p["valid"])
    points = F.transform(
        F.filter(parsed, lambda p: p["valid"]),
        lambda p: F.array(p["lon"], p["lat"]),
    )
    closed = _close_ring(points)
    poisoned = (
        polygon_str.isNull()
        | (F.trim(polygon_str) == "")
        | any_invalid
        | (F.size(points) < 3)
    )
    return F.when(~poisoned, closed)


def _parse_pair(pair: Column) -> Column:
    parts = F.split(pair, ",", -1)
    lat_str = F.try_element_at(parts, F.lit(1))
    lon_str = F.try_element_at(parts, F.lit(2))
    lat = js_parse_float(lat_str)
    lon = js_parse_float(lon_str)
    valid = (
        pair.contains(",")
        & (F.size(parts) == 2)
        & (F.trim(lat_str) != "")
        & (F.trim(lon_str) != "")
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
    """
    n = F.size(ring)
    # Pair consecutive vertices via two slices (cheaper than an indexed
    # fold: HOF lambdas are interpreted, so fewer/simpler lambda bodies win).
    p0s = F.slice(ring, 1, n - 1)
    p1s = F.slice(ring, 2, n - 1)
    a2 = F.aggregate(
        F.zip_with(p0s, p1s, lambda p, q: p[0] * q[1] - q[0] * p[1]),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    cxs = F.aggregate(
        F.zip_with(
            p0s, p1s, lambda p, q: (p[0] + q[0]) * (p[0] * q[1] - q[0] * p[1])
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    cys = F.aggregate(
        F.zip_with(
            p0s, p1s, lambda p, q: (p[1] + q[1]) * (p[0] * q[1] - q[0] * p[1])
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    area = a2 * F.lit(0.5)
    mean_x = F.aggregate(ring, F.lit(0.0), lambda a, p: a + p[0]) / n
    mean_y = F.aggregate(ring, F.lit(0.0), lambda a, p: a + p[1]) / n
    degenerate = F.abs(area) < F.lit(DEGENERATE_AREA_EPS)
    lon = (
        F.when(n < 3, F.lit(0.0))
        .when(degenerate, mean_x)
        .otherwise(cxs / (F.lit(6.0) * area))
    )
    lat = (
        F.when(n < 3, F.lit(0.0))
        .when(degenerate, mean_y)
        .otherwise(cys / (F.lit(6.0) * area))
    )
    return F.struct(lon.alias("lon"), lat.alias("lat"))


def centroid_window(df: DataFrame, id_col: str, ring_col: str) -> DataFrame:
    """G3 window-function variant (SURVEY.md §2.9).

    ``posexplode`` the ring, pair consecutive vertices with ``lead() over
    (partition by id order by pos)``, then hash-aggregate the three shoelace
    sums. Same numbers as :func:`centroid`; exists to give the engine a real
    window + aggregation code path with a DuckDB oracle.

    Scale note: the window and groupBy share the same partitioning key, so
    Catalyst reuses one hash-partition exchange of ``id_col`` for both.
    """
    pts = df.select(
        id_col,
        F.size(ring_col).alias("_n"),
        F.posexplode(ring_col).alias("pos", "pt"),
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    pts = pts.select(
        id_col,
        "_n",
        F.col("pt")[0].alias("x0"),
        F.col("pt")[1].alias("y0"),
        F.lead(F.col("pt")[0]).over(w).alias("x1"),
        F.lead(F.col("pt")[1]).over(w).alias("y1"),
    )
    agg = pts.groupBy(id_col).agg(
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
    return agg.select(
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


def fallback_point() -> Column:
    """G5: NZ-centre Point (task.ts:791-796) as ``struct<lon,lat>``."""
    return F.struct(
        F.lit(NZ_CENTER_LON).alias("lon"), F.lit(NZ_CENTER_LAT).alias("lat")
    )
