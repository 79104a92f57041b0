"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship end-to-end CAP pipeline (derived alerts →
filters → geometry → feature fan-out) at sf0.001. ``queries()`` maps every
implemented operator from SURVEY.md §2 (plus the extension operators) to a
callable, and ``oracle_sql()`` provides the equivalent DuckDB SQL.

CAP-domain operators take their input from a deterministic derivation over
the driver's ``orders`` table (etl_capnz_spark/harness/derive.py) — integer
arithmetic only, value-identical in both dialects by construction.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_capnz_spark.functions.lookups import (
    category_description,
    event_description,
    event_icon,
)
from etl_capnz_spark.functions.remarks import remarks
from etl_capnz_spark.functions.signature import color_code, signature_struct
from etl_capnz_spark.functions.timestamps import iso_utc, nz_local, start_ts
from etl_capnz_spark.harness import derive
from etl_capnz_spark.harness.derive import NOW, cap_alerts
from etl_capnz_spark.harness import oracles
from etl_capnz_spark.operators.extract import active_filter, required_filter
from etl_capnz_spark.operators.features import build_features

_DUCK = "WITH " + derive.DUCK_CAP_CTE


def _active(spark: SparkSession, sf_dir: str) -> DataFrame:
    return active_filter(required_filter(cap_alerts(spark, sf_dir)), NOW)


_ACTIVE_WHERE = (
    "identifier <> '' AND sender <> '' AND sent_ts IS NOT NULL "
    f"AND (expires_ts IS NULL OR expires_ts >= TIMESTAMP '{NOW}')"
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full CAP feature pipeline at sf0.001 (driver smoke gate)."""
    return build_features(_active(spark, "/root/testdata/sf0.001"))


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------


def _q_active_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _active(spark, sf_dir).select(
        "k", "identifier", "status", "category", "severity"
    )


def _q_category_description(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cap_alerts(spark, sf_dir).select(
        "k",
        "category",
        category_description(F.col("category")).alias("category_desc"),
    )


def _q_event_description(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cap_alerts(spark, sf_dir).select(
        "k", "event", event_description(F.col("event")).alias("event_desc")
    )


def _q_event_icon(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cap_alerts(spark, sf_dir).select(
        "k",
        event_icon(
            F.col("event"), F.col("category"), F.col("severity"), F.col("headline")
        ).alias("icon"),
    )


def _q_color_code(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cap_alerts(spark, sf_dir).select(
        "k", color_code(F.col("parameters")).alias("color")
    )


def _q_signature(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = cap_alerts(spark, sf_dir).filter(F.col("x509_certificate").isNotNull())
    sig = signature_struct(F.col("x509_certificate"))
    return df.select(
        "k",
        sig["issuer"].alias("issuer"),
        sig["subject"].alias("subject"),
        sig["valid_until"].alias("valid_until"),
        sig["fingerprint"].alias("fingerprint"),
    )


def _q_timestamps(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = cap_alerts(spark, sf_dir)
    return df.select(
        "k",
        iso_utc(F.col("sent_ts")).alias("time_iso"),
        iso_utc(start_ts(F.col("onset_ts"), F.col("sent_ts"))).alias("start_iso"),
        iso_utc(F.col("expires_ts")).alias("stale_iso"),
    )


def _q_nz_local(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = cap_alerts(spark, sf_dir)
    return df.select(
        "k",
        nz_local(F.col("onset_ts")).alias("onset_nz"),
        nz_local(F.col("expires_ts")).alias("expires_nz"),
    )


def _q_remarks(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = cap_alerts(spark, sf_dir)
    sig = signature_struct(F.col("x509_certificate"))
    return df.select(
        "k",
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
            sig["subject"],
            sig["issuer"],
            sig["valid_until"],
            sig["fingerprint"],
            sig.isNotNull(),
        ).alias("remarks"),
    )


def _q_callsign_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = cap_alerts(spark, sf_dir)
    web = F.nullif(F.col("web"), F.lit(""))
    return df.select(
        "k",
        F.coalesce(F.nullif(F.col("headline"), F.lit("")), F.lit("CAP Alert")).alias(
            "callsign"
        ),
        F.lit("a-f-X-i").alias("cot_type"),
        F.when(web.isNotNull(), F.col("identifier")).alias("link_uid"),
        web.alias("link_url"),
        F.when(web.isNotNull(), F.lit("r-u")).alias("link_relation"),
        F.when(web.isNotNull(), F.lit("text/html")).alias("link_mime"),
        F.lit(False).alias("archived"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "cap_active_alerts": _q_active_alerts,
        "cap_category_description": _q_category_description,
        "cap_event_description": _q_event_description,
        "cap_event_icon": _q_event_icon,
        "cap_color_code": _q_color_code,
        "cap_signature": _q_signature,
        "cap_timestamps": _q_timestamps,
        "cap_nz_local": _q_nz_local,
        "cap_remarks": _q_remarks,
        "cap_callsign_links": _q_callsign_links,
    }


# ---------------------------------------------------------------------------
# oracle SQL (DuckDB dialect)
# ---------------------------------------------------------------------------

_ISO_FMT_DUCK = "%Y-%m-%dT%H:%M:%S.%gZ"
_NZ_FMT_DUCK = "%-d/%m/%Y, %-I:%M:%S %p"


def _nz_sql(col: str) -> str:
    return (
        f"strftime(({col} AT TIME ZONE 'UTC') AT TIME ZONE 'Pacific/Auckland', "
        f"'{_NZ_FMT_DUCK}') || ' NZT'"
    )


def _sig_fields_sql() -> str:
    """Common CTE: k + signature fields for alerts carrying a cert."""
    d = "sig_decoded"
    dates = f"regexp_extract_all({d}, '{oracles.ASN1_DATE_RE_SQL}')"
    return f"""
  SELECT k,
    coalesce(nullif(trim(regexp_extract({d}, 'CN=([^,]+)', 1)), ''), 'MetService')
      AS sig_issuer,
    coalesce(nullif(trim(regexp_extract({d}, 'O=([^,]+)', 1)), ''),
             'METEOROLOGICAL SERVICE OF NEW ZEALAND LIMITED') AS sig_subject,
    CASE WHEN len({dates}) >= 2 THEN
      '20' || substr(({dates})[2], 1, 2) || '-' || substr(({dates})[2], 3, 2)
           || '-' || substr(({dates})[2], 5, 2)
    ELSE '2025-10-23' END AS sig_valid_until,
    rtrim(regexp_replace(upper(sha256({d})), '(..)', '\\1:', 'g'), ':')
      AS sig_fingerprint
  FROM (SELECT k, {oracles.SIG_DECODED} AS sig_decoded FROM cap
        WHERE x509_certificate IS NOT NULL)
"""


def oracle_sql() -> dict[str, str]:
    remarks_lines = ", ".join(
        [
            "'Description: ' || description",
            "'Instruction: ' || instruction",
            f"'Category: ' || {oracles.category_desc_sql()}",
            f"'Event: ' || {oracles.event_desc_sql()}",
            "'Urgency: ' || CASE WHEN urgency = '' THEN 'Unknown' ELSE urgency END",
            "'Severity: ' || CASE WHEN severity = '' THEN 'Unknown' ELSE severity END",
            "'Certainty: ' || CASE WHEN certainty = '' THEN 'Unknown' ELSE certainty END",
            "'Response: ' || CASE WHEN response_type = '' THEN 'Unknown' ELSE response_type END",
            f"CASE WHEN onset_ts IS NOT NULL THEN 'Onset: ' || {_nz_sql('onset_ts')} END",
            f"CASE WHEN expires_ts IS NOT NULL THEN 'Expires: ' || {_nz_sql('expires_ts')} END",
            "CASE WHEN has_sig THEN 'Digital Signature' END",
            "CASE WHEN has_sig THEN 'Name: ' || sig_subject END",
            "CASE WHEN has_sig THEN 'Issuer: ' || sig_issuer END",
            "CASE WHEN has_sig THEN 'Valid Until: ' || sig_valid_until END",
            "CASE WHEN has_sig THEN 'Fingerprint: ' || sig_fingerprint END",
        ]
    )
    return {
        "cap_active_alerts": f"""{_DUCK}
            SELECT k, identifier, status, category, severity
            FROM cap WHERE {_ACTIVE_WHERE}""",
        "cap_category_description": f"""{_DUCK}
            SELECT k, category, {oracles.category_desc_sql()} AS category_desc
            FROM cap""",
        "cap_event_description": f"""{_DUCK}
            SELECT k, event, {oracles.event_desc_sql()} AS event_desc FROM cap""",
        "cap_event_icon": f"""{_DUCK}
            SELECT k, {oracles.event_icon_sql()} AS icon FROM cap""",
        "cap_color_code": f"""{_DUCK}
            SELECT k, {oracles.color_code_sql()} AS color FROM cap""",
        "cap_signature": f"""{_DUCK}, sig AS ({_sig_fields_sql()})
            SELECT k, sig_issuer AS issuer, sig_subject AS subject,
                   sig_valid_until AS valid_until, sig_fingerprint AS fingerprint
            FROM sig""",
        "cap_timestamps": f"""{_DUCK}
            SELECT k,
              strftime(sent_ts, '{_ISO_FMT_DUCK}') AS time_iso,
              strftime(coalesce(onset_ts, sent_ts), '{_ISO_FMT_DUCK}') AS start_iso,
              strftime(expires_ts, '{_ISO_FMT_DUCK}') AS stale_iso
            FROM cap""",
        "cap_nz_local": f"""{_DUCK}
            SELECT k,
              CASE WHEN onset_ts IS NOT NULL THEN {_nz_sql('onset_ts')} END AS onset_nz,
              CASE WHEN expires_ts IS NOT NULL THEN {_nz_sql('expires_ts')} END AS expires_nz
            FROM cap""",
        "cap_remarks": f"""{_DUCK}, sig AS ({_sig_fields_sql()}),
            capx AS (
              SELECT cap.*, sig.sig_subject, sig.sig_issuer, sig.sig_valid_until,
                     sig.sig_fingerprint,
                     (cap.x509_certificate IS NOT NULL) AS has_sig
              FROM cap LEFT JOIN sig ON cap.k = sig.k
            )
            SELECT k, concat_ws(chr(10), {remarks_lines}) AS remarks FROM capx""",
        "cap_callsign_links": f"""{_DUCK}
            SELECT k,
              CASE WHEN headline = '' THEN 'CAP Alert' ELSE headline END AS callsign,
              'a-f-X-i' AS cot_type,
              CASE WHEN web <> '' THEN identifier END AS link_uid,
              nullif(web, '') AS link_url,
              CASE WHEN web <> '' THEN 'r-u' END AS link_relation,
              CASE WHEN web <> '' THEN 'text/html' END AS link_mime,
              false AS archived
            FROM cap""",
    }
