"""Dimension lookups C1-C3 (SURVEY.md §2.6).

The reference resolves CAP category/event codes to descriptions and icons via
in-process dict lookups (reference ``task.ts:68-123`` maps, ``task.ts:181-253``
logic). Semantically these are broadcast map-side joins against tiny literal
dimension tables, so the engine exposes BOTH forms:

* ``category_description(col)`` etc. — pure ``Column`` expressions using
  literal ``create_map``s: constant-folded by Catalyst, zero shuffle, the
  right call at any scale.
* ``category_dim(spark)`` / ``join_category(df)`` — the same dimension as a
  DataFrame plus an explicit ``broadcast()`` left join, exercising the
  engine's broadcast-join path.

Icon resolution (C3, ``task.ts:189-253``) is an ordered precedence chain;
the order of the ``when`` clauses below encodes it exactly.
"""

from __future__ import annotations

from itertools import chain

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# CAP category code → human description (task.ts:68-81).
CATEGORY_MAP: dict[str, str] = {
    "Geo": "Geophysical (including landslide)",
    "Met": "Meteorological (including flood)",
    "Safety": "General emergency and public safety",
    "Security": "Law enforcement, military, homeland and local/private security",
    "Rescue": "Rescue and recovery",
    "Fire": "Fire suppression and rescue",
    "Health": "Medical and public health",
    "Env": "Pollution and other environmental hazards",
    "Transport": "Public and private transportation",
    "Infra": "Utility, telecommunication, other non-transport infrastructure",
    "CBRNE": "Chemical, Biological, Radiological, Nuclear or High-Yield Explosive threat or attack",
    "Other": "Other events",
}

# CAP event code → human description (task.ts:83-123).
EVENT_MAP: dict[str, str] = {
    "storm": "Storm",
    "hail": "Hail",
    "rainfall": "Rainfall",
    "snowfall": "Snowfall",
    "thunderstorm": "Thunderstorm",
    "tornado": "Tornado",
    "tropCyclone": "Tropical Cyclone",
    "tropStorm": "Tropical Storm",
    "winterStorm": "Winter Storm",
    "weather": "Weather",
    "temperature": "Temperature",
    "coldOutbreak": "Cold Outbreak",
    "heatWave": "Heat Wave",
    "frost": "Frost",
    "windChill": "Wind Chill",
    "wind": "Wind",
    "avLightning": "Airport Lightning Threat",
    "avThunder": "Airport Thunder Threat",
    "fireWeather": "Fire Weather",
    "flood": "Flood",
    "flashFlood": "Flash Flood",
    "highWater": "High Water Level",
    "stormSurge": "Storm Surge",
    "riverFlood": "River Flood",
    "earthquake": "Earthquake",
    "tsunami": "Tsunami",
    "landTsunami": "Land Threat Tsunami",
    "beachTsunami": "Beach Threat Tsunami",
    "marine": "Marine",
    "galeWind": "Gale Wind",
    "hurricFrcWnd": "Hurricane Force Wind",
    "iceberg": "Iceberg",
    "largeSurf": "Large Coastal Surf",
    "largeSwell": "Large Swell Waves",
    "squall": "Squall",
    "stormFrcWind": "Storm Force Wind",
    "strongWind": "Strong Wind",
    "waterspout": "Waterspout",
    "snow": "Snow",
}

ICON_PREFIX = "bb4df0a6-ca8d-4ba8-bb9e-3deb97ff015e:"  # task.ts:125
DEFAULT_ICON = "Incidents/INC.01.IndicentGeneric.Yellow.png"  # task.ts:126

# event key → icon path (task.ts:127-173).
ICON_MAP: dict[str, str] = {
    "snow": "NaturalHazards/NH.07.Snow.png",
    "snowfall": "NaturalHazards/NH.07.Snow.png",
    "rain": "NaturalHazards/NH.05.HeavyRain.png",
    "rainfall": "NaturalHazards/NH.05.HeavyRain.png",
    "wind": "NaturalHazards/NH.04.StrongWind.png",
    "storm": "NaturalHazards/NH.06.ElectricalStorm.png",
    "thunderstorm": "NaturalHazards/NH.06.ElectricalStorm.png",
    "tornado": "NaturalHazards/NH.16.Tornado.png",
    "tropCyclone": "NaturalHazards/NH.09.TropicalCyclone.png",
    "tropStorm": "NaturalHazards/NH.09.TropicalCyclone.png",
    "flood": "NaturalHazards/NH.01.Flood.png",
    "flashFlood": "NaturalHazards/NH.01.Flood.png",
    "earthquake": "NaturalHazards/NH.24.Earthquake.png",
    "tsunami": "NaturalHazards/NH.03.Tsunami.png",
    "marine": "Incidents/INC.24.Marine.png",
    "fire": "Incidents/INC.35.Fire.png",
    "fireWeather": "Incidents/INC.37.Fire.Vegetation.png",
    "landslide": "NaturalHazards/NH.18.Landslide.png",
    "stormSurge": "NaturalHazards/NH.02.StormSurge.png",
    "ice": "NaturalHazards/NH.08.Ice.png",
    "drought": "NaturalHazards/NH.22.Drought.png",
    "biosecurity": "NaturalHazards/NH.23.Biosecurity.png",
    "hail": "NaturalHazards/NH.06.ElectricalStorm.png",
    "winterStorm": "NaturalHazards/NH.07.Snow.png",
    "weather": "Incidents/INC.38.NaturalDisaster1.Urgent.png",
    "temperature": "Incidents/INC.38.NaturalDisaster1.Urgent.png",
    "coldOutbreak": "NaturalHazards/NH.08.Ice.png",
    "heatWave": "Incidents/INC.38.NaturalDisaster1.Urgent.png",
    "frost": "NaturalHazards/NH.08.Ice.png",
    "windChill": "NaturalHazards/NH.08.Ice.png",
    "avLightning": "NaturalHazards/NH.06.ElectricalStorm.png",
    "avThunder": "NaturalHazards/NH.06.ElectricalStorm.png",
    "highWater": "NaturalHazards/NH.01.Flood.png",
    "riverFlood": "NaturalHazards/NH.01.Flood.png",
    "landTsunami": "NaturalHazards/NH.03.Tsunami.png",
    "beachTsunami": "NaturalHazards/NH.03.Tsunami.png",
    "galeWind": "NaturalHazards/NH.04.StrongWind.png",
    "hurricFrcWnd": "NaturalHazards/NH.04.StrongWind.png",
    "iceberg": "Incidents/INC.24.Marine.png",
    "largeSurf": "Incidents/INC.24.Marine.png",
    "largeSwell": "Incidents/INC.24.Marine.png",
    "squall": "NaturalHazards/NH.04.StrongWind.png",
    "stormFrcWind": "NaturalHazards/NH.04.StrongWind.png",
    "strongWind": "NaturalHazards/NH.04.StrongWind.png",
    "waterspout": "NaturalHazards/NH.16.Tornado.png",
}

# Contains-pattern chain checked against normalized event AND headline, in
# declaration order (task.ts:207-231). Each entry: (alternatives, icon key).
ICON_PATTERNS: list[tuple[tuple[str, ...], str]] = [
    (("thunderstorm", "thunder"), "thunderstorm"),
    (("flashflood",), "flashFlood"),
    (("heavyrain", "rainfall"), "rainfall"),
    (("strongwind", "galewind", "stormwind"), "wind"),
    (("winterstorm",), "winterStorm"),
    (("stormsurge",), "stormSurge"),
    (("tropicalcyclone",), "tropCyclone"),
    (("tropicalstorm",), "tropStorm"),
    (("earthquake",), "earthquake"),
    (("tsunami",), "tsunami"),
    (("tornado",), "tornado"),
    (("flood",), "flood"),
    (("snow", "snowfall"), "snow"),
    (("hail",), "hail"),
    (("marine",), "marine"),
    (("waterspout",), "waterspout"),
]

# ColourCode name → hex (task.ts:466-473).
COLOR_MAP: dict[str, str] = {
    "Red": "#FF0000",
    "Orange": "#FF8918",
    "Yellow": "#FFFF00",
    "Green": "#00FF00",
    "Blue": "#0000FF",
}


def _literal_map(d: dict[str, str]) -> Column:
    return F.create_map(*[F.lit(x) for x in chain.from_iterable(d.items())])


def category_description(category: Column) -> Column:
    """C1: map lookup → raw code → 'Unknown' (task.ts:181-183)."""
    return F.coalesce(
        F.try_element_at(_literal_map(CATEGORY_MAP), category),
        F.nullif(category, F.lit("")),
        F.lit("Unknown"),
    )


def event_description(event: Column) -> Column:
    """C2: map lookup → raw code → 'Unknown' (task.ts:185-187)."""
    return F.coalesce(
        F.try_element_at(_literal_map(EVENT_MAP), event),
        F.nullif(event, F.lit("")),
        F.lit("Unknown"),
    )


def _normalize(col: Column) -> Column:
    """lowercase + strip whitespace/hyphen runs (task.ts:203-204)."""
    return F.regexp_replace(F.lower(col), r"[\s-]+", "")


def event_icon(
    event: Column,
    category: Column,
    severity: Column,
    headline: Column,
) -> Column:
    """C3: full icon precedence chain (task.ts:189-253).

    Order: Health/Fire category overrides → empty-event default → contains
    patterns over normalized event OR headline → direct map lookup on the
    normalized event → Met/Geo severity tiers → default.
    """
    norm = _normalize(event)
    headline_norm = F.coalesce(_normalize(headline), F.lit(""))
    icon_map = _literal_map(ICON_MAP)

    chain_expr = F.when(category == "Health", F.lit("Incidents/INC.60.GHS08.HealthHazard.png"))
    chain_expr = chain_expr.when(category == "Fire", F.lit("Incidents/INC.35.Fire.png"))
    chain_expr = chain_expr.when(
        event.isNull() | (event == ""), F.lit(DEFAULT_ICON)
    )
    for alternatives, key in ICON_PATTERNS:
        cond = F.lit(False)
        for alt in alternatives:
            cond = cond | norm.contains(alt) | headline_norm.contains(alt)
        chain_expr = chain_expr.when(cond, F.lit(ICON_MAP.get(key, DEFAULT_ICON)))
    # Direct lookup probes the ORIGINAL map twice — with the normalized event
    # and with the plain lowercased event (task.ts:234). CamelCase map keys
    # (e.g. 'tropCyclone') are unreachable by either probe; that quirk is
    # intentional and preserved.
    direct = F.coalesce(
        F.try_element_at(icon_map, norm), F.try_element_at(icon_map, F.lower(event))
    )
    chain_expr = chain_expr.when(direct.isNotNull(), direct)
    met_geo = category.isin("Met", "Geo")
    chain_expr = chain_expr.when(
        met_geo & severity.isin("Severe", "Extreme"),
        F.lit("Incidents/INC.38.NaturalDisaster1.Urgent.png"),
    )
    chain_expr = chain_expr.when(
        met_geo & (severity == "Moderate"),
        F.lit("Incidents/INC.39.NaturalDisaster2.NonUrgent.png"),
    )
    chain_expr = chain_expr.when(
        met_geo & (severity == "Minor"),
        F.lit("Incidents/INC.40.NaturalDisaster3.InformationOnly.png"),
    )
    return F.concat(F.lit(ICON_PREFIX), chain_expr.otherwise(F.lit(DEFAULT_ICON)))


def category_dim(spark: SparkSession) -> DataFrame:
    """C1 as a dimension table — for the broadcast-join form."""
    return spark.createDataFrame(
        [(k, v) for k, v in CATEGORY_MAP.items()], "code string, description string"
    )


def join_category(df: DataFrame, category_col: str = "category") -> DataFrame:
    """C1 as an explicit broadcast left join.

    At 100 TB the dimension is 12 rows — broadcast is mandatory; the
    ``F.broadcast`` hint makes it explicit rather than relying on the
    autoBroadcastJoinThreshold.
    """
    spark = df.sparkSession
    dim = category_dim(spark).select(
        F.col("code").alias("_dim_code"), F.col("description").alias("_dim_desc")
    )
    joined = df.join(
        F.broadcast(dim), df[category_col] == dim["_dim_code"], "left"
    )
    return joined.withColumn(
        "category_description",
        F.coalesce(
            F.col("_dim_desc"),
            F.nullif(F.col(category_col), F.lit("")),
            F.lit("Unknown"),
        ),
    ).drop("_dim_code", "_dim_desc")
