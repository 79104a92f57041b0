"""Derived CAP alert table for the DuckDB-oracle harness.

The driver's correctness gate (README/__spark_entry__.py) runs each engine
query against read-only TPC-H-ish parquet and compares with DuckDB running
equivalent ANSI SQL on the same files. The CAP-domain operators need
CAP-shaped inputs (polygon strings, parameter lists, base64 certs …), so
this module derives them DETERMINISTICALLY from ``orders`` — pure integer
arithmetic on ``o_orderkey``, expressed once in Spark SQL and once in DuckDB
SQL. Both derivations are value-identical by construction (integer → string
casts only; no float formatting).

Geometry families (g = k % 7):
  0,1 → one valid open square polygon        → polygon + center features
  2   → square + triangle (multi-polygon)    → 4 features, ids suffixed -0/-1
  3   → square + POISONED polygon (lat 91)   → square's 2 features emitted,
        then the loop aborts → fallback NZ-centre point (task.ts:776-796)
  4   → valid circle "lat,lon 25.5"          → point at circle centre
  5   → invalid circle (radius -1)           → fallback NZ-centre point
  6   → no geometry                          → fallback NZ-centre point

Certificate families (k % 3): 0 → none; 1 → decodable cert with CN=/O= and
two ASN.1 dates; 2 → decodable cert with no extractable fields (defaults
path, task.ts:502-504).

Colour families (k % 4): 0 → ColourCodeHex; 1 → ColourCode name (incl. an
unmapped name); 2 → both (hex wins, task.ts:460-465); 3 → no parameters.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

#: Fixed evaluation instant for the expiry filter (FIXTURES.md: tests must be
#: deterministic; the reference compares wall-clock, task.ts:636).
NOW = "2026-08-13 00:00:00"

_STATUS = "'Actual','Exercise','Test'"
_CATEGORY = (
    "'Geo','Met','Safety','Security','Rescue','Fire','Health','Env',"
    "'Transport','Infra','CBRNE','Other','Volcano',''"
)
_EVENT = (
    "'strongWind','rainfall','tsunami','earthquake','heatWave',"
    "'volcanicActivity','Strong Wind Watch',''"
)
_URGENCY = "'Immediate','Expected','Future',''"
_SEVERITY = "'Extreme','Severe','Moderate','Minor',''"
_CERTAINTY = "'Observed','Likely','Possible',''"
_HEADLINE = (
    "'','Severe Thunderstorm Warning','Flood Watch for Westland',"
    "'Strong Wind Watch','General Notice','Tsunami Warning'"
)
_RESPONSE = "'Shelter','Evacuate','Monitor',''"
_COLOR_NAMES = "'Red','Orange','Yellow','Green','Blue','Magenta'"

# ---------------------------------------------------------------------------
# Spark dialect
# ---------------------------------------------------------------------------

SPARK_CAP_SQL = f"""
WITH src AS (
  SELECT o_orderkey AS k, o_orderdate,
         (o_orderkey % 60) - 45 AS lat0,
         (o_orderkey % 29) + 150 AS lon0
  FROM {{orders}}
),
geo AS (
  SELECT *,
    concat(cast(lat0 AS string), ',', cast(lon0 AS string), ' ',
           cast(lat0 + 1 AS string), ',', cast(lon0 AS string), ' ',
           cast(lat0 + 1 AS string), ',', cast(lon0 + 1 AS string), ' ',
           cast(lat0 AS string), ',', cast(lon0 + 1 AS string)) AS poly_sq,
    concat(cast(lat0 AS string), ',', cast(lon0 AS string), ' ',
           cast(lat0 + 2 AS string), ',', cast(lon0 AS string), ' ',
           cast(lat0 AS string), ',', cast(lon0 + 2 AS string)) AS poly_tri,
    concat('91,', cast(lon0 AS string), ' ',
           cast(lat0 AS string), ',', cast(lon0 AS string)) AS poly_bad,
    cast(k % 7 AS int) AS g
  FROM src
),
certs AS (
  SELECT *,
    -- regexp_replace strips the MIME line breaks Spark's base64() inserts
    -- every 76 chars (DuckDB's to_base64 emits none).
    CASE
      WHEN k % 3 = 1 THEN
        regexp_replace(
          base64(cast(concat('SEQUENCE CN=Alert Authority ', cast(k % 5 AS string),
                             ', O=CAP Org ', cast(k % 5 AS string),
                             ', C=NZ 240101000000Z 27', cast(10 + k % 9 AS string),
                             '15000000Z TRAILER') AS binary)), '[\\r\\n]', '')
      WHEN k % 3 = 2 THEN
        regexp_replace(
          base64(cast(concat('OPAQUE NO FIELDS HERE ', cast(k AS string)) AS binary)),
          '[\\r\\n]', '')
    END AS cert_b64
  FROM geo
)
SELECT
  k,
  lat0, lon0, g,
  CASE WHEN k % 37 = 0 THEN '' ELSE concat('CAP-', cast(k AS string)) END AS identifier,
  CASE WHEN k % 41 = 0 THEN '' ELSE 'metservice.cap.nz' END AS sender,
  o_orderdate AS sent_ts,
  element_at(array({_STATUS}), cast(k % 3 AS int) + 1) AS status,
  CASE WHEN k % 5 = 3 THEN 'Update' WHEN k % 5 = 4 THEN 'Cancel' ELSE 'Alert' END AS msg_type,
  'Public' AS scope,
  element_at(array({_CATEGORY}), cast(k % 14 AS int) + 1) AS category,
  element_at(array({_EVENT}), cast(k % 8 AS int) + 1) AS event,
  element_at(array({_URGENCY}), cast(k % 4 AS int) + 1) AS urgency,
  element_at(array({_SEVERITY}), cast(k % 5 AS int) + 1) AS severity,
  element_at(array({_CERTAINTY}), cast((k * 3) % 4 AS int) + 1) AS certainty,
  'MetService New Zealand' AS sender_name,
  element_at(array({_HEADLINE}), cast(k % 6 AS int) + 1) AS headline,
  concat('Automated alert body ', cast(k AS string)) AS description,
  CASE WHEN k % 2 = 0 THEN 'Take shelter immediately.' ELSE '' END AS instruction,
  element_at(array({_RESPONSE}), cast((k * 7) % 4 AS int) + 1) AS response_type,
  CASE WHEN k % 3 = 0 THEN o_orderdate + make_interval(0,0,0,0,2,0,0) END AS onset_ts,
  CASE WHEN k % 7 = 6 THEN NULL
       ELSE timestamp'{NOW}' + make_interval(0,0,0,0, cast(k % 97 AS int) - 48, 0, 0)
  END AS expires_ts,
  CASE WHEN k % 2 = 1 THEN concat('https://alerts.example.nz/cap/', cast(k AS string), '.xml')
       ELSE '' END AS web,
  concat('Zone-', cast(k % 10 AS string)) AS area_desc,
  CASE
    WHEN g IN (0, 1) THEN array(poly_sq)
    WHEN g = 2 THEN array(poly_sq, poly_tri)
    WHEN g = 3 THEN array(poly_sq, poly_bad)
    ELSE cast(array() AS array<string>)
  END AS polygons,
  CASE
    WHEN g = 4 THEN concat(cast(lat0 AS string), ',', cast(lon0 AS string), ' 25.5')
    WHEN g = 5 THEN concat(cast(lat0 AS string), ',', cast(lon0 AS string), ' -1')
    ELSE ''
  END AS circle,
  CASE
    WHEN k % 4 = 0 THEN array(named_struct('value_name', 'ColourCodeHex', 'value', '#1A2B3C'))
    WHEN k % 4 = 1 THEN array(named_struct('value_name', 'ColourCode', 'value',
        element_at(array({_COLOR_NAMES}), cast(k % 6 AS int) + 1)))
    WHEN k % 4 = 2 THEN array(named_struct('value_name', 'ColourCode', 'value', 'Red'),
                              named_struct('value_name', 'ColourCodeHex', 'value', '#00CC99'))
    ELSE cast(array() AS array<struct<value_name:string,value:string>>)
  END AS parameters,
  CASE WHEN cert_b64 IS NOT NULL THEN
    concat(substr(cert_b64, 1, 8), '&#13;', chr(10), ' ', substr(cert_b64, 9))
  END AS x509_certificate
FROM certs
"""

# ---------------------------------------------------------------------------
# DuckDB dialect — value-identical by construction
# ---------------------------------------------------------------------------

DUCK_CAP_CTE = f"""
src AS (
  SELECT o_orderkey AS k, o_orderdate,
         (o_orderkey % 60) - 45 AS lat0,
         (o_orderkey % 29) + 150 AS lon0
  FROM orders
),
geo AS (
  SELECT *,
    concat(lat0, ',', lon0, ' ', lat0 + 1, ',', lon0, ' ',
           lat0 + 1, ',', lon0 + 1, ' ', lat0, ',', lon0 + 1) AS poly_sq,
    concat(lat0, ',', lon0, ' ', lat0 + 2, ',', lon0, ' ',
           lat0, ',', lon0 + 2) AS poly_tri,
    concat('91,', lon0, ' ', lat0, ',', lon0) AS poly_bad,
    (k % 7) AS g
  FROM src
),
certs AS (
  SELECT *,
    CASE
      WHEN k % 3 = 1 THEN
        to_base64(encode(concat('SEQUENCE CN=Alert Authority ', k % 5,
                                ', O=CAP Org ', k % 5,
                                ', C=NZ 240101000000Z 27', 10 + k % 9,
                                '15000000Z TRAILER')))
      WHEN k % 3 = 2 THEN
        to_base64(encode(concat('OPAQUE NO FIELDS HERE ', k)))
    END AS cert_b64
  FROM geo
),
cap AS (
SELECT
  k,
  lat0, lon0, g,
  CASE WHEN k % 37 = 0 THEN '' ELSE concat('CAP-', k) END AS identifier,
  CASE WHEN k % 41 = 0 THEN '' ELSE 'metservice.cap.nz' END AS sender,
  o_orderdate AS sent_ts,
  ([{_STATUS}])[(k % 3) + 1] AS status,
  CASE WHEN k % 5 = 3 THEN 'Update' WHEN k % 5 = 4 THEN 'Cancel' ELSE 'Alert' END AS msg_type,
  'Public' AS scope,
  ([{_CATEGORY}])[(k % 14) + 1] AS category,
  ([{_EVENT}])[(k % 8) + 1] AS event,
  ([{_URGENCY}])[(k % 4) + 1] AS urgency,
  ([{_SEVERITY}])[(k % 5) + 1] AS severity,
  ([{_CERTAINTY}])[((k * 3) % 4) + 1] AS certainty,
  'MetService New Zealand' AS sender_name,
  ([{_HEADLINE}])[(k % 6) + 1] AS headline,
  concat('Automated alert body ', k) AS description,
  CASE WHEN k % 2 = 0 THEN 'Take shelter immediately.' ELSE '' END AS instruction,
  ([{_RESPONSE}])[((k * 7) % 4) + 1] AS response_type,
  CASE WHEN k % 3 = 0 THEN o_orderdate + to_hours(2) END AS onset_ts,
  CASE WHEN k % 7 = 6 THEN NULL
       ELSE TIMESTAMP '{NOW}' + to_hours((k % 97) - 48)
  END AS expires_ts,
  CASE WHEN k % 2 = 1 THEN concat('https://alerts.example.nz/cap/', k, '.xml')
       ELSE '' END AS web,
  concat('Zone-', k % 10) AS area_desc,
  CASE
    WHEN g IN (0, 1) THEN [poly_sq]
    WHEN g = 2 THEN [poly_sq, poly_tri]
    WHEN g = 3 THEN [poly_sq, poly_bad]
    ELSE []::VARCHAR[]
  END AS polygons,
  CASE
    WHEN g = 4 THEN concat(lat0, ',', lon0, ' 25.5')
    WHEN g = 5 THEN concat(lat0, ',', lon0, ' -1')
    ELSE ''
  END AS circle,
  CASE
    WHEN k % 4 = 0 THEN [{{'value_name': 'ColourCodeHex', 'value': '#1A2B3C'}}]
    WHEN k % 4 = 1 THEN [{{'value_name': 'ColourCode',
                          'value': ([{_COLOR_NAMES}])[(k % 6) + 1]}}]
    WHEN k % 4 = 2 THEN [{{'value_name': 'ColourCode', 'value': 'Red'}},
                         {{'value_name': 'ColourCodeHex', 'value': '#00CC99'}}]
    ELSE []::STRUCT(value_name VARCHAR, "value" VARCHAR)[]
  END AS parameters,
  CASE WHEN cert_b64 IS NOT NULL THEN
    concat(substr(cert_b64, 1, 8), '&#13;', chr(10), ' ', substr(cert_b64, 9))
  END AS x509_certificate
FROM certs
)
"""


def cap_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialize the derived CAP alert DataFrame for one scale factor.

    The driver's parquet files are single-file/single-row-group, so a scan
    yields ONE input split regardless of core count; everything downstream
    (polygon parse, centroid, remarks) is CPU-heavy per row. Repartitioning
    the tiny (k, o_orderdate) projection first costs one shuffle of ~16
    bytes/row and buys full-cluster parallelism — the same move a real
    pipeline makes before fanning out per-alert work (SURVEY.md §2.1 S2).
    """
    from etl_capnz_spark.session import ensure_session_confs

    ensure_session_confs(spark)
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    orders = orders.select("o_orderkey", "o_orderdate").repartition(
        spark.sparkContext.defaultParallelism
    )
    orders.createOrReplaceTempView("cap_orders_src")
    return spark.sql(SPARK_CAP_SQL.format(orders="cap_orders_src"))
