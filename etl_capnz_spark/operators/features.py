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

Scale notes: the whole build is narrow (filters, per-row expressions,
posexplode) plus one ``unionByName`` — no join, no shuffle except the
optional downstream sink aggregation. Explode fan-out is at most 2× per
polygon; a pathological alert with thousands of polygons is handled by AQE
coalescing after the explode.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

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
    sig = signature_struct(F.nullif(F.col("x509_certificate"), F.lit("")))
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
    )


def _base_props(feature_id: Column) -> list[Column]:
    return [
        feature_id.alias("feature_id"),
        F.col("_callsign").alias("callsign"),
        F.lit(COT_TYPE).alias("cot_type"),
        F.col("_time").alias("time_iso"),
        F.col("_start").alias("start_iso"),
        F.col("_stale").alias("stale_iso"),
        F.col("_remarks").alias("remarks"),
        F.when(F.col("_web").isNotNull(), feature_id).alias("link_uid"),
        F.col("_web").alias("link_url"),
        F.lit(False).alias("archived"),
    ]


def build_features(alerts: DataFrame) -> DataFrame:
    """Full F1-F3 fan-out: alert rows → feature rows (FEATURE_COLUMNS)."""
    df = _with_common(alerts)
    has_polygons = F.size(F.col("polygons")) > 0

    # --- polygon branch -------------------------------------------------
    poly_alerts = df.filter(has_polygons).withColumn(
        "_first_bad",
        F.array_position(
            F.transform(F.col("polygons"), lambda s: parse_polygon(s).isNull()),
            True,
        ),
    )
    exploded = poly_alerts.select(
        "*",
        F.posexplode("polygons").alias("_pos", "_poly_str"),
        F.size("polygons").alias("_n_poly"),
    ).filter(
        # Stop at the first poisoned polygon (loop-abort semantics).
        (F.col("_first_bad") == 0) | (F.col("_pos") + 1 < F.col("_first_bad"))
    )
    parsed = exploded.withColumn("_ring", parse_polygon(F.col("_poly_str"))).filter(
        F.col("_ring").isNotNull() & (F.size("_ring") >= 4)  # G4
    )
    poly_id = F.when(
        F.col("_n_poly") > 1,
        F.concat(F.col("identifier"), F.lit("-"), F.col("_pos")),
    ).otherwise(F.col("identifier"))
    parsed = parsed.withColumn("_pid", poly_id).withColumn(
        "_centroid", centroid(F.col("_ring"))
    )

    polygon_features = parsed.select(
        *_base_props(F.col("_pid")),
        F.lit("Polygon").alias("geom_type"),
        F.lit(None).cast("double").alias("lon"),
        F.lit(None).cast("double").alias("lat"),
        F.col("_ring").alias("ring"),
        F.lit(None).cast("string").alias("icon"),
        F.col("_color").alias("stroke"),
        F.when(F.col("_color").isNotNull(), F.lit(POLY_STROKE_OPACITY)).alias(
            "stroke_opacity"
        ),
        F.when(F.col("_color").isNotNull(), F.lit(3)).alias("stroke_width"),
        F.when(F.col("_color").isNotNull(), F.lit("solid")).alias("stroke_style"),
        F.col("_color").alias("fill"),
        F.when(F.col("_color").isNotNull(), F.lit(POLY_FILL_OPACITY)).alias(
            "fill_opacity"
        ),
        F.lit(False).alias("is_center"),
    )

    center_id = F.concat(F.col("_pid"), F.lit("-center"))
    center_features = parsed.select(
        *_base_props(center_id),
        F.lit("Point").alias("geom_type"),
        F.col("_centroid")["lon"].alias("lon"),
        F.col("_centroid")["lat"].alias("lat"),
        F.lit(None).cast("array<array<double>>").alias("ring"),
        F.col("_icon").alias("icon"),
        F.lit(None).cast("string").alias("stroke"),
        F.lit(None).cast("double").alias("stroke_opacity"),
        F.lit(None).cast("int").alias("stroke_width"),
        F.lit(None).cast("string").alias("stroke_style"),
        F.lit(None).cast("string").alias("fill"),
        F.lit(None).cast("double").alias("fill_opacity"),
        F.lit(True).alias("is_center"),
    )

    # --- point branch ---------------------------------------------------
    # (a) polygon-poisoned alerts fall through with null geometry → NZ centre;
    # (b) no-polygon alerts consult the circle, then NZ centre.
    poly_failed = poly_alerts.filter(F.col("_first_bad") > 0).withColumn(
        "_pt",
        F.struct(
            F.lit(NZ_CENTER_LON).alias("lon"), F.lit(NZ_CENTER_LAT).alias("lat")
        ),
    )
    no_poly = df.filter(~has_polygons).withColumn(
        "_circle", parse_circle(F.nullif(F.col("circle"), F.lit("")))
    )
    no_poly = no_poly.withColumn(
        "_pt",
        F.when(
            F.col("_circle").isNotNull(),
            F.struct(
                F.col("_circle")["lon"].alias("lon"),
                F.col("_circle")["lat"].alias("lat"),
            ),
        ).otherwise(
            F.struct(
                F.lit(NZ_CENTER_LON).alias("lon"), F.lit(NZ_CENTER_LAT).alias("lat")
            )
        ),
    )

    def point_features(src: DataFrame) -> DataFrame:
        return src.select(
            *_base_props(F.col("identifier")),
            F.lit("Point").alias("geom_type"),
            F.col("_pt")["lon"].alias("lon"),
            F.col("_pt")["lat"].alias("lat"),
            F.lit(None).cast("array<array<double>>").alias("ring"),
            F.col("_icon").alias("icon"),
            F.col("_color").alias("stroke"),
            F.when(F.col("_color").isNotNull(), F.lit(POINT_OPACITY)).alias(
                "stroke_opacity"
            ),
            F.when(F.col("_color").isNotNull(), F.lit(3)).alias("stroke_width"),
            F.when(F.col("_color").isNotNull(), F.lit("solid")).alias("stroke_style"),
            F.col("_color").alias("fill"),
            F.when(F.col("_color").isNotNull(), F.lit(POINT_OPACITY)).alias(
                "fill_opacity"
            ),
            F.lit(False).alias("is_center"),
        )

    out = (
        polygon_features.unionByName(center_features)
        .unionByName(point_features(poly_failed))
        .unionByName(point_features(no_poly))
    )
    return out.select(*FEATURE_COLUMNS)
