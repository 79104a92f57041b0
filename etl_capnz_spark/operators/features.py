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


def _with_common(df: DataFrame) -> DataFrame:
    """Shared per-alert computed columns (C2-C9, X2, X3)."""
    # once_per_row: the signature chain (2× regexp_replace + unbase64 +
    # sha2 + 3× regexp_extract, all interpreted non-codegen exprs) is
    # referenced 5× by _remarks below; without the Generate barrier,
    # projection collapse re-evaluates the whole chain per reference
    # (same pushdown-duplication pathology as the XML parse, r2).
    sig = once_per_row(
        signature_struct(F.nullif(F.col("x509_certificate"), F.lit("")))
    )
    return (
        df.withColumn("_color", color_code(F.col("parameters")))
        .withColumn("_sig", sig)
        .withColumn(
            "_remarks",
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
            ),
        )
        .withColumn(
            "_callsign",
            F.coalesce(F.nullif(F.col("headline"), F.lit("")), F.lit("CAP Alert")),
        )
        .withColumn("_time", iso_utc(F.col("sent_ts")))
        .withColumn("_start", iso_utc(start_ts(F.col("onset_ts"), F.col("sent_ts"))))
        .withColumn("_stale", iso_utc(F.col("expires_ts")))
        .withColumn(
            "_icon",
            event_icon(
                F.col("event"), F.col("category"), F.col("severity"), F.col("headline")
            ),
        )
        .withColumn("_web", F.nullif(F.col("web"), F.lit("")))
        # properties.metadata — the 19-field CAP object the reference puts
        # on EVERY feature (task.ts:673-693 polygon, 825-844 point; the
        # centroid feature spreads the same object + isCenter,
        # task.ts:752-755 — isCenter is merged at the sink from is_center).
        # The reference carries the raw XML strings; this engine's alert
        # table holds parsed timestamps, so sent/onset/expires are DEFINED
        # as their ISO-8601 UTC rendering ('' when absent, matching the
        # reference's ''-coalescing of missing fields, task.ts:420-448).
        .withColumn(
            "_metadata",
            F.struct(
                F.col("sender").alias("sender"),
                F.coalesce(iso_utc(F.col("sent_ts")), F.lit("")).alias("sent"),
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
            ),
        )
    )


_METADATA_STRUCT = (
    "struct<sender:string,sent:string,status:string,msgType:string,"
    "scope:string,category:string,event:string,urgency:string,"
    "severity:string,certainty:string,senderName:string,headline:string,"
    "description:string,instruction:string,responseType:string,"
    "onset:string,expires:string,web:string,areaDesc:string>"
)

_FEATURE_STRUCT = (
    "struct<feature_id:string,geom_type:string,lon:double,lat:double,"
    "ring:array<array<double>>,callsign:string,cot_type:string,"
    "time_iso:string,start_iso:string,stale_iso:string,icon:string,"
    f"metadata:{_METADATA_STRUCT},"
    "remarks:string,link_uid:string,link_url:string,stroke:string,"
    "stroke_opacity:double,stroke_width:int,stroke_style:string,"
    "fill:string,fill_opacity:double,is_center:boolean,archived:boolean>"
)

def _empty_features() -> Column:
    return F.expr(f"cast(array() as array<{_FEATURE_STRUCT}>)")


def _feature(
    feature_id: Column,
    geom_type: str,
    *,
    lon: Column | None = None,
    lat: Column | None = None,
    ring: Column | None = None,
    icon: Column | None = None,
    stroke_opacity: float | None = None,
    fill_opacity: float | None = None,
    styled: bool = False,
    is_center: bool = False,
) -> Column:
    """One feature struct (schema = _FEATURE_DDL), sharing the per-alert
    common columns computed by ``_with_common``."""
    color = F.col("_color")
    null_s = F.lit(None).cast("string")
    return F.struct(
        feature_id.alias("feature_id"),
        F.lit(geom_type).alias("geom_type"),
        (lon if lon is not None else F.lit(None).cast("double")).alias("lon"),
        (lat if lat is not None else F.lit(None).cast("double")).alias("lat"),
        (
            ring if ring is not None else F.lit(None).cast("array<array<double>>")
        ).alias("ring"),
        F.col("_callsign").alias("callsign"),
        F.lit(COT_TYPE).alias("cot_type"),
        F.col("_time").alias("time_iso"),
        F.col("_start").alias("start_iso"),
        F.col("_stale").alias("stale_iso"),
        (icon if icon is not None else null_s).alias("icon"),
        F.col("_metadata").alias("metadata"),
        F.col("_remarks").alias("remarks"),
        F.when(F.col("_web").isNotNull(), feature_id).alias("link_uid"),
        F.col("_web").alias("link_url"),
        (color if styled else null_s).alias("stroke"),
        (
            F.when(color.isNotNull(), F.lit(stroke_opacity))
            if styled
            else F.lit(None).cast("double")
        ).alias("stroke_opacity"),
        (
            F.when(color.isNotNull(), F.lit(3))
            if styled
            else F.lit(None).cast("int")
        ).alias("stroke_width"),
        (
            F.when(color.isNotNull(), F.lit("solid")) if styled else null_s
        ).alias("stroke_style"),
        (color if styled else null_s).alias("fill"),
        (
            F.when(color.isNotNull(), F.lit(fill_opacity))
            if styled
            else F.lit(None).cast("double")
        ).alias("fill_opacity"),
        F.lit(is_center).alias("is_center"),
        F.lit(False).alias("archived"),
    )


def build_features(alerts: DataFrame) -> DataFrame:
    """Full F1-F3 fan-out: alert rows → feature rows (FEATURE_COLUMNS).

    Single-pass design: each alert row builds an ``array<feature struct>``
    (0, 1 or 2·n_polygons+1 entries) which is exploded ONCE. Compared to a
    4-way union of projections this computes the expensive per-alert
    columns (remarks, signature, icon) exactly once, needs no shuffle, no
    barrier, and stays a fully narrow pipeline — the shape that scales
    linearly at 100 TB. All polygon strings are parsed ONCE into a
    materialized ``_rings`` projection (Catalyst keeps a non-cheap alias
    referenced more than once un-inlined), shared by the poison scan and
    the feature fan-out; the centroid struct is let-bound per ring.
    """
    df = (
        _with_common(alerts)
        # once_per_row barrier (functions/exprs.py): the parsed rings are
        # referenced by the poison scan AND the fan-out, and the parse is
        # a large interpreted HOF tree that optimizer rewrites can
        # otherwise duplicate into each reference (measured ~20% of the
        # feature build).
        .select(
            "*",
            once_per_row(
                F.transform(F.col("polygons"), parse_polygon)
            ).alias("_rings"),
        )
        .withColumn(
            "_first_bad",
            F.when(
                F.size(F.col("polygons")) > 0,
                F.array_position(
                    F.transform(F.col("_rings"), lambda r: r.isNull()),
                    True,
                ),
            ).otherwise(F.lit(0)),
        )
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
                _feature(
                    pid(i),
                    "Polygon",
                    ring=ring,
                    styled=True,
                    stroke_opacity=POLY_STROKE_OPACITY,
                    fill_opacity=POLY_FILL_OPACITY,
                ),
                _feature(
                    F.concat(pid(i), F.lit("-center")),
                    "Point",
                    lon=c["lon"],
                    lat=c["lat"],
                    icon=F.col("_icon"),
                    is_center=True,
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
        return _feature(
            F.col("identifier"),
            "Point",
            lon=pt_lon,
            lat=pt_lat,
            icon=F.col("_icon"),
            styled=True,
            stroke_opacity=POINT_OPACITY,
            fill_opacity=POINT_OPACITY,
        )

    poly_part = F.flatten(F.transform(F.col("_rings"), per_polygon))
    fallback = F.when(
        F.col("_first_bad") > 0, F.array(point_feature(F.lit(NZ_CENTER_LON), F.lit(NZ_CENTER_LAT)))
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

    out = df.select(F.explode(features_array).alias("_f")).select("_f.*")
    return out.select(*FEATURE_COLUMNS)
