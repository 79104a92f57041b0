"""Feature fan-out F1-F3 + property build C4-C9 (SURVEY.md §2.5, §2.6).

Input: the flattened alert table (one row per CAP alert, schema per
FIXTURES.md §2). Output: one row per GeoJSON feature, flat columns (the
sink folds them into Feature JSON — sinks/geojson.py).

Control-flow semantics reproduced from the reference's per-alert loop
(task.ts:626-879):

* polygon branch (``polygons`` non-empty): polygons parse IN ORDER; the
  first poisoned polygon aborts the loop (throw → catch, task.ts:776-779),
  so polygons BEFORE it still emit features, polygons after it do not, and
  the alert ALSO emits a fallback NZ-centre point (geometry stayed null —
  the circle is never consulted on this path). Valid polygons with a closed
  ring of ≥4 points emit TWO features: the polygon and a ``-center``
  centroid point (F2). Feature id carries a ``-{i}`` suffix only when the
  original list had >1 entries (F1, task.ts:662).
* point branch (no polygons): valid circle → point at its centre (radius
  parsed then discarded, task.ts:780-788); else NZ-centre fallback
  (task.ts:791-796).
* style asymmetry (C8): polygon features carry flat stroke/fill props with
  opacities 0.5/0.4 (task.ts:723-730); point/circle features carry a
  ``style`` object with both opacities 128/255 = 0.5019607843137255
  (task.ts:799-806); centroid features carry NO style.

Scale notes: the whole build is one narrow pass — per-alert enrichment, an
``array<feature>`` construction, one explode. No join, no shuffle, no
union; see ``build_features`` for why this beats the 4-way-union shape.
"""

from __future__ import annotations

from functools import lru_cache

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_capnz_spark.functions.exprs import once_per_row
from etl_capnz_spark.functions.lookups import event_icon
from etl_capnz_spark.functions.remarks import remarks
from etl_capnz_spark.functions.signature import color_code, signature_struct
from etl_capnz_spark.functions.timestamps import iso_utc, start_ts
from etl_capnz_spark.operators.geometry import (
    NZ_CENTER_LAT,
    NZ_CENTER_LON,
    centroid,
    parse_circle,
    parse_polygon,
)

COT_TYPE = "a-f-X-i"  # task.ts:669
POINT_OPACITY = 0.5019607843137255  # 128/255, task.ts:801/804
POLY_STROKE_OPACITY = 0.5  # task.ts:725
POLY_FILL_OPACITY = 0.4  # task.ts:728

FEATURE_COLUMNS = [
    "feature_id",
    "geom_type",
    "lon",
    "lat",
    "ring",
    "callsign",
    "cot_type",
    "time_iso",
    "start_iso",
    "stale_iso",
    "icon",
    "metadata",
    "remarks",
    "link_uid",
    "link_url",
    "stroke",
    "stroke_opacity",
    "stroke_width",
    "stroke_style",
    "fill",
    "fill_opacity",
    "is_center",
    "archived",
]


@lru_cache(maxsize=None)
def _s1_cols() -> tuple:
    """Layer-1 computed columns: colour + the signature barrier.

    Expression-construction cache (opt r10, guide §1): every Column here
    is a pure function of CONSTANT column names, yet each build paid
    hundreds of py4j round-trips — profiling showed ~half of
    cap_features' bench wall was DataFrame CONSTRUCTION, not execution.
    ``lru_cache`` builds each (immutable, unresolved) expression tree
    once per process; re-use across DataFrames is safe because
    resolution happens per-plan at analysis. No data or results are
    cached — this is the prepared-statement discipline.
    """
    # once_per_row: the signature chain (2× regexp_replace + unbase64 +
    # sha2 + 3× regexp_extract, all interpreted non-codegen exprs) is
    # referenced 5× by _remarks below; without the Generate barrier,
    # projection collapse re-evaluates the whole chain per reference
    # (same pushdown-duplication pathology as the XML parse, r2).
    sig = once_per_row(
        signature_struct(F.nullif(F.col("x509_certificate"), F.lit("")))
    )
    return (
        color_code(F.col("parameters")).alias("_color"),
        sig.alias("_sig"),
    )


@lru_cache(maxsize=None)
def _s2_cols() -> tuple:
    """Layer-2 computed columns (need ``_sig`` from layer 1)."""
    return (
        remarks(
            F.col("description"),
            F.col("instruction"),
            F.col("category"),
            F.col("event"),
            F.col("urgency"),
            F.col("severity"),
            F.col("certainty"),
            F.col("response_type"),
            F.col("onset_ts"),
            F.col("expires_ts"),
            F.col("_sig")["subject"],
            F.col("_sig")["issuer"],
            F.col("_sig")["valid_until"],
            F.col("_sig")["fingerprint"],
            F.col("_sig").isNotNull(),
        ).alias("_remarks"),
        F.coalesce(
            F.nullif(F.col("headline"), F.lit("")), F.lit("CAP Alert")
        ).alias("_callsign"),
        iso_utc(F.col("sent_ts")).alias("_time"),
        iso_utc(start_ts(F.col("onset_ts"), F.col("sent_ts"))).alias("_start"),
        iso_utc(F.col("expires_ts")).alias("_stale"),
        event_icon(
            F.col("event"), F.col("category"), F.col("severity"), F.col("headline")
        ).alias("_icon"),
        F.nullif(F.col("web"), F.lit("")).alias("_web"),
    )


@lru_cache(maxsize=None)
def _s3_cols() -> tuple:
    """Layer 3: properties.metadata — the 19-field CAP object the
    reference puts on EVERY feature (task.ts:673-693 polygon, 825-844
    point; the centroid feature spreads the same object + isCenter,
    task.ts:752-755 — isCenter is merged at the sink from is_center).
    The reference carries the raw XML strings; this engine's alert
    table holds parsed timestamps, so sent/onset/expires are DEFINED
    as their ISO-8601 UTC rendering ('' when absent, matching the
    reference's ''-coalescing of missing fields, task.ts:420-448).
    ``sent`` reuses the already-computed ``_time`` (same expression)."""
    return (
        F.struct(
            F.col("sender").alias("sender"),
            F.coalesce(F.col("_time"), F.lit("")).alias("sent"),
            F.col("status").alias("status"),
            F.col("msg_type").alias("msgType"),
            F.col("scope").alias("scope"),
            F.col("category").alias("category"),
            F.col("event").alias("event"),
            F.col("urgency").alias("urgency"),
            F.col("severity").alias("severity"),
            F.col("certainty").alias("certainty"),
            F.col("sender_name").alias("senderName"),
            F.col("headline").alias("headline"),
            F.col("description").alias("description"),
            F.col("instruction").alias("instruction"),
            F.col("response_type").alias("responseType"),
            F.coalesce(iso_utc(F.col("onset_ts")), F.lit("")).alias("onset"),
            F.coalesce(iso_utc(F.col("expires_ts")), F.lit("")).alias(
                "expires"
            ),
            F.col("web").alias("web"),
            F.col("area_desc").alias("areaDesc"),
        ).alias("_metadata"),
    )


def _with_common(df: DataFrame) -> DataFrame:
    """Shared per-alert computed columns (C2-C9, X2, X3).

    Build-time shape (opt r10, guide §1): three ``select`` layers instead
    of eight ``withColumn`` calls — each DataFrame transformation is an
    eager analyzer pass over the whole accumulated plan plus a py4j
    round-trip per expression. Values are unchanged: the same
    expressions, grouped by dependency (layer 2 needs ``_sig``;
    ``_metadata`` in layer 3 reuses ``_time`` from layer 2 instead of
    re-running ``iso_utc(sent_ts)``).
    """
    return (
        df.select("*", *_s1_cols())
        .select("*", *_s2_cols())
        .select("*", *_s3_cols())
    )


# Compact per-feature struct: ONLY the fields that vary between the
# features of one alert (opt r10, guide §2.3/§1 — move small rows, attach
# heavy per-alert payloads once). ``kind``: 0 = styled polygon,
# 1 = centroid point, 2 = styled point. Everything else (callsign, times,
# metadata, remarks, link/style derivations) is a pure function of
# (kind, fid, per-alert commons) and is attached in ONE projection after
# the explode — the old shape copied the 19-field metadata struct,
# remarks and five timestamps into every element of the feature array and
# unpacked them again, and its 23-field × 3-variant expression tree
# dominated both the driver's plan-construction time and the array-build
# CPU (measured: ~2 s of cap_features' 3.9 s bench wall was DataFrame
# construction + planning).
_COMPACT_STRUCT = (
    "struct<fid:string,kind:int,lon:double,lat:double,"
    "ring:array<array<double>>>"
)


def _empty_features() -> Column:
    return F.expr(f"cast(array() as array<{_COMPACT_STRUCT}>)")


def _compact_feature(
    fid: Column,
    kind: int,
    *,
    lon: Column | None = None,
    lat: Column | None = None,
    ring: Column | None = None,
) -> Column:
    return F.struct(
        fid.alias("fid"),
        F.lit(kind).alias("kind"),
        (lon if lon is not None else F.lit(None).cast("double")).alias("lon"),
        (lat if lat is not None else F.lit(None).cast("double")).alias("lat"),
        (
            ring if ring is not None else F.lit(None).cast("array<array<double>>")
        ).alias("ring"),
    )


#: Columns carried through the explode (per-alert commons).
_CARRY = [
    "_callsign",
    "_time",
    "_start",
    "_stale",
    "_icon",
    "_web",
    "_metadata",
    "_remarks",
    "_color",
]


@lru_cache(maxsize=None)
def _assemble_cols() -> tuple:
    """Final projection columns: (compact feature ``_f``, per-alert
    commons) → FEATURE_COLUMNS. Field-for-field identical to the
    reference mapping: polygon features (kind 0) carry flat stroke/fill
    with opacities 0.5/0.4 and no icon; centroid features (kind 1)
    carry the icon and NO style; point features (kind 2) carry the icon
    and both opacities 128/255 (task.ts:723-730, 752-755, 799-806)."""
    f = F.col("_f")
    kind = f["kind"]
    fid = f["fid"]
    color = F.col("_color")
    styled = kind != 1
    has_color = styled & color.isNotNull()
    return (
        fid.alias("feature_id"),
        F.when(kind == 0, F.lit("Polygon")).otherwise(F.lit("Point")).alias(
            "geom_type"
        ),
        f["lon"].alias("lon"),
        f["lat"].alias("lat"),
        f["ring"].alias("ring"),
        F.col("_callsign").alias("callsign"),
        F.lit(COT_TYPE).alias("cot_type"),
        F.col("_time").alias("time_iso"),
        F.col("_start").alias("start_iso"),
        F.col("_stale").alias("stale_iso"),
        F.when(kind != 0, F.col("_icon")).alias("icon"),
        F.col("_metadata").alias("metadata"),
        F.col("_remarks").alias("remarks"),
        F.when(F.col("_web").isNotNull(), fid).alias("link_uid"),
        F.col("_web").alias("link_url"),
        F.when(styled, color).alias("stroke"),
        F.when(
            has_color,
            F.when(kind == 0, F.lit(POLY_STROKE_OPACITY)).otherwise(
                F.lit(POINT_OPACITY)
            ),
        ).alias("stroke_opacity"),
        F.when(has_color, F.lit(3)).alias("stroke_width"),
        F.when(has_color, F.lit("solid")).alias("stroke_style"),
        F.when(styled, color).alias("fill"),
        F.when(
            has_color,
            F.when(kind == 0, F.lit(POLY_FILL_OPACITY)).otherwise(
                F.lit(POINT_OPACITY)
            ),
        ).alias("fill_opacity"),
        (kind == 1).alias("is_center"),
        F.lit(False).alias("archived"),
    )


@lru_cache(maxsize=None)
def _fanout_cols() -> tuple:
    """The per-alert compact-feature array (plus its two let-bound
    helper columns) — cached like the common layers; pure function of
    constant column names. Returns (rings_barrier, first_bad,
    features_array)."""
    rings = once_per_row(
        F.transform(F.col("polygons"), parse_polygon)
    ).alias("_rings")
    first_bad = (
        F.when(
            F.size(F.col("polygons")) > 0,
            F.array_position(
                F.transform(F.col("_rings"), lambda r: r.isNull()),
                True,
            ),
        )
        .otherwise(F.lit(0))
        .alias("_first_bad")
    )

    n_poly = F.size(F.col("polygons"))

    def pid(i: Column) -> Column:
        return F.when(
            n_poly > 1,
            F.concat(F.col("identifier"), F.lit("-"), i.cast("string")),
        ).otherwise(F.col("identifier"))

    def per_ring(ring: Column, i: Column) -> Column:
        # Let-bind the centroid struct (single-element transform) so the
        # shoelace fold runs once per ring, not once per field reference.
        def with_c(c: Column) -> Column:
            return F.array(
                _compact_feature(pid(i), 0, ring=ring),
                _compact_feature(
                    F.concat(pid(i), F.lit("-center")),
                    1,
                    lon=c["lon"],
                    lat=c["lat"],
                ),
            )

        bound = F.try_element_at(
            F.transform(F.array(centroid(ring)), with_c), F.lit(1)
        )
        return F.when(
            ring.isNotNull() & (F.size(ring) >= 4),  # G4
            bound,
        ).otherwise(_empty_features())

    def per_polygon(ring: Column, i: Column) -> Column:
        kept = (F.col("_first_bad") == 0) | (i + 1 < F.col("_first_bad"))
        return F.when(kept, per_ring(ring, i)).otherwise(_empty_features())

    def point_feature(pt_lon: Column, pt_lat: Column) -> Column:
        return _compact_feature(F.col("identifier"), 2, lon=pt_lon, lat=pt_lat)

    poly_part = F.flatten(F.transform(F.col("_rings"), per_polygon))
    fallback = F.when(
        F.col("_first_bad") > 0,
        F.array(point_feature(F.lit(NZ_CENTER_LON), F.lit(NZ_CENTER_LAT))),
    ).otherwise(_empty_features())

    circle = parse_circle(F.nullif(F.col("circle"), F.lit("")))
    circle_pt = F.try_element_at(
        F.transform(
            F.array(circle),
            lambda c: F.array(
                point_feature(
                    F.coalesce(c["lon"], F.lit(NZ_CENTER_LON)),
                    F.coalesce(c["lat"], F.lit(NZ_CENTER_LAT)),
                )
            ),
        ),
        F.lit(1),
    )

    features_array = F.when(
        n_poly > 0, F.concat(poly_part, fallback)
    ).otherwise(circle_pt)
    return rings, first_bad, features_array


def build_features(alerts: DataFrame) -> DataFrame:
    """Full F1-F3 fan-out: alert rows → feature rows (FEATURE_COLUMNS).

    Single-pass design: each alert row builds an ``array<compact feature>``
    (0, 1 or 2·n_polygons+1 entries — fid/kind/lon/lat/ring only) which is
    exploded ONCE; the per-alert commons (metadata, remarks, callsign,
    times, style derivations) are attached in one projection AFTER the
    explode (opt r10 — the array carries ~40 bytes per feature instead of
    the full 23-field row). Compared to a 4-way union of projections this
    computes the expensive per-alert columns (remarks, signature, icon)
    exactly once, needs no shuffle, no barrier, and stays a fully narrow
    pipeline — the shape that scales linearly at 100 TB. All polygon strings are parsed ONCE into a
    materialized ``_rings`` projection (Catalyst keeps a non-cheap alias
    referenced more than once un-inlined), shared by the poison scan and
    the feature fan-out; the centroid struct is let-bound per ring.
    """
    rings, first_bad, features_array = _fanout_cols()
    df = (
        _with_common(alerts)
        # once_per_row barrier (functions/exprs.py): the parsed rings are
        # referenced by the poison scan AND the fan-out, and the parse is
        # a large interpreted HOF tree that optimizer rewrites can
        # otherwise duplicate into each reference (measured ~20% of the
        # feature build).
        .select("*", rings)
        .select("*", first_bad)
    )
    exploded = df.select(*_CARRY, F.explode(features_array).alias("_f"))
    return exploded.select(*_assemble_cols())
