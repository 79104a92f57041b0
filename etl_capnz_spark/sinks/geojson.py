"""S4/S5: feature rows → GeoJSON Feature documents and a FeatureCollection
(SURVEY.md §2.1).

The reference accumulates features into one in-memory FeatureCollection and
POSTs it (task.ts:615-623, 882). Distributed translation:

* ``feature_json`` — per-row Feature document via ``to_json`` (pure
  Catalyst; nulls dropped so conditional keys like ``links``/``stroke``
  disappear exactly as the reference's object spreads do).
* ``write_features`` — the scalable sink: newline-delimited GeoJSON
  features partitioned however the caller chooses. At 100 TB you never
  materialize ONE collection document.
* ``feature_collection_json`` — the reference-shape single document for
  API submission; driver-side by construction (bounded output: one batch
  of alerts, dozens of features — task.ts workload shape).
* ``counted`` — S5 diagnostics via ``observe`` (no extra action, unlike
  the reference's console.log which is free only because it is
  single-process).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def _geometry_struct():
    ring = F.col("ring")
    return F.when(
        F.col("geom_type") == "Polygon",
        F.to_json(F.struct(F.lit("Polygon").alias("type"), F.array(ring).alias("coordinates"))),
    ).otherwise(
        F.to_json(
            F.struct(
                F.lit("Point").alias("type"),
                F.array(F.col("lon"), F.col("lat")).alias("coordinates"),
            )
        )
    )


def feature_json(features: DataFrame) -> DataFrame:
    """One GeoJSON Feature document per row: (feature_id, feature).

    Document-shape asymmetries reproduced from the reference:

    * ``properties.metadata`` — the 19-field CAP object on every feature
      (task.ts:673-693, 825-844), with ``isCenter: true`` merged onto
      centroid features only (task.ts:752-755; absent otherwise, exactly
      as the object spread adds the key only there).
    * polygon features carry FLAT ``stroke``/``fill`` keys, present only
      when a colour is set (task.ts:723-730).
    * point-branch features (circle centre / NZ fallback) carry a nested
      ``style`` object that is ALWAYS present — ``{}`` when no colour,
      because the reference assigns ``style: baseStyle`` unconditionally
      with ``baseStyle = {}`` (task.ts:860-868, 870).
    * centroid features carry neither (task.ts:744-772).
    """
    is_polygon = F.col("geom_type") == "Polygon"
    is_point_branch = (F.col("geom_type") == "Point") & (~F.col("is_center"))
    meta = F.struct(
        F.col("metadata.sender").alias("sender"),
        F.col("metadata.sent").alias("sent"),
        F.col("metadata.status").alias("status"),
        F.col("metadata.msgType").alias("msgType"),
        F.col("metadata.scope").alias("scope"),
        F.col("metadata.category").alias("category"),
        F.col("metadata.event").alias("event"),
        F.col("metadata.urgency").alias("urgency"),
        F.col("metadata.severity").alias("severity"),
        F.col("metadata.certainty").alias("certainty"),
        F.col("metadata.senderName").alias("senderName"),
        F.col("metadata.headline").alias("headline"),
        F.col("metadata.description").alias("description"),
        F.col("metadata.instruction").alias("instruction"),
        F.col("metadata.responseType").alias("responseType"),
        F.col("metadata.onset").alias("onset"),
        F.col("metadata.expires").alias("expires"),
        F.col("metadata.web").alias("web"),
        F.col("metadata.areaDesc").alias("areaDesc"),
        # null unless centroid → to_json drops the key except there
        F.when(F.col("is_center"), F.lit(True)).alias("isCenter"),
    )
    style = F.when(
        is_point_branch,
        F.struct(
            F.col("stroke"),
            F.col("stroke_opacity").alias("stroke-opacity"),
            F.col("stroke_width").alias("stroke-width"),
            F.col("stroke_style").alias("stroke-style"),
            F.col("fill_opacity").alias("fill-opacity"),
            F.col("fill"),
        ),
    )
    props = F.struct(
        F.col("callsign"),
        F.col("cot_type").alias("type"),
        F.col("time_iso").alias("time"),
        F.col("start_iso").alias("start"),
        F.col("stale_iso").alias("stale"),
        F.col("icon"),
        meta.alias("metadata"),
        F.col("remarks"),
        F.when(
            F.col("link_uid").isNotNull(),
            F.array(
                F.struct(
                    F.col("link_uid").alias("uid"),
                    F.lit("r-u").alias("relation"),
                    F.lit("text/html").alias("mime"),
                    F.col("link_url").alias("url"),
                    F.lit("CAP Alert Details").alias("remarks"),
                )
            ),
        ).alias("links"),
        # flat styling: polygon features only (reference key order,
        # fill-opacity BEFORE fill — task.ts:723-730)
        F.when(is_polygon, F.col("stroke")).alias("stroke"),
        F.when(is_polygon, F.col("stroke_opacity")).alias("stroke-opacity"),
        F.when(is_polygon, F.col("stroke_width")).alias("stroke-width"),
        F.when(is_polygon, F.col("stroke_style")).alias("stroke-style"),
        F.when(is_polygon, F.col("fill_opacity")).alias("fill-opacity"),
        F.when(is_polygon, F.col("fill")).alias("fill"),
        style.alias("style"),
        F.col("archived"),
    )
    # to_json drops NULL fields (ignoreNullFields) — conditional keys like
    # links/stroke/stale vanish exactly as the reference's object spreads
    # and undefined values do under JSON.stringify.
    head = F.to_json(
        F.struct(
            F.col("feature_id").alias("id"),
            F.lit("Feature").alias("type"),
            props.alias("properties"),
        )
    )
    staged = features.select(
        F.col("feature_id"), head.alias("_head"), _geometry_struct().alias("_geom")
    )
    feature = F.concat(
        F.expr("substring(_head, 1, length(_head) - 1)"),
        F.lit(',"geometry":'),
        F.col("_geom"),
        F.lit("}"),
    )
    return staged.select(F.col("feature_id"), feature.alias("feature"))


def write_features(features: DataFrame, path: str, partitions: int | None = None):
    """Scalable sink: newline-delimited Feature JSON."""
    docs = feature_json(features)
    if partitions is not None:
        docs = docs.repartition(partitions)
    docs.select("feature").write.mode("overwrite").text(path)


def feature_collection_json(features: DataFrame) -> str:
    """The reference-shape single FeatureCollection document (bounded
    output only — one scheduled batch)."""
    rows = feature_json(features).select("feature").collect()
    body = ",".join(r["feature"] for r in rows)
    return '{"type":"FeatureCollection","features":[' + body + "]}"


def counted(features: DataFrame) -> tuple[DataFrame, Observation]:
    """S5: attach an Observation counting emitted features — read
    ``obs.get`` after the action, zero extra passes."""
    obs = Observation("feature_metrics")
    observed = features.observe(
        obs, F.count(F.lit(1)).alias("n_features")
    )
    return observed, obs
