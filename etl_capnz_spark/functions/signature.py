"""Semi-structured extraction X2/X3 (SURVEY.md §2.3) — pure built-ins.

X2 (task.ts:457-476): CAP ``<parameter>`` list → colour code. Priority:
``ColourCodeHex`` value wins; else ``ColourCode`` name mapped through the
5-colour hex map (unknown name → null); else null.

X3 (task.ts:479-517): X.509 ``<X509Certificate>`` base64 payload →
{issuer, subject, valid_until, fingerprint}:

* cleanup: strip ``&#13;`` entities and ALL whitespace (task.ts:484),
* fingerprint: SHA-256 over the DECODED bytes, hex uppercased, colon-grouped
  every 2 chars (task.ts:488-491),
* issuer/subject: first ``CN=`` / ``O=`` groups of the decoded text, with
  defaults ``'MetService'`` / the MetService legal name (task.ts:502-503),
* valid_until: SECOND ASN.1 ``YYMMDDHHMMSSZ`` match → ``20YY-MM-DD``
  (task.ts:497-499, 504), default ``'2025-10-23'``.

A cert that fails base64 decode takes the catch-path defaults
(task.ts:510-515): issuer ``'cap.metservice.com'``, fingerprint 'Unknown'.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from etl_capnz_spark.functions.lookups import COLOR_MAP

CERT_DEFAULT_ISSUER = "cap.metservice.com"  # task.ts:176
CERT_DEFAULT_SUBJECT = "METEOROLOGICAL SERVICE OF NEW ZEALAND LIMITED"  # task.ts:177
CERT_DEFAULT_VALID_UNTIL = "2025-10-23"  # task.ts:178
CATCH_ISSUER = "MetService"  # task.ts:502 (cnMatch-miss default)

ASN1_DATE_RE = r"(\d{2})(\d{2})(\d{2})(\d{2})(\d{2})(\d{2})Z"


def color_code(parameters: Column) -> Column:
    """X2: ``array<struct<value_name,value>>`` → hex colour string or null."""
    hex_map = F.create_map(*[F.lit(x) for kv in COLOR_MAP.items() for x in kv])
    hex_params = F.filter(parameters, lambda p: p["value_name"] == F.lit("ColourCodeHex"))
    name_params = F.filter(parameters, lambda p: p["value_name"] == F.lit("ColourCode"))
    return F.coalesce(
        F.try_element_at(hex_params, F.lit(1))["value"],
        F.when(
            F.size(name_params) > 0,
            F.try_element_at(hex_map, F.try_element_at(name_params, F.lit(1))["value"]),
        ),
    )


def clean_cert(cert: Column) -> Column:
    """Strip ``&#13;`` entities and whitespace (task.ts:484).

    Single alternation pass instead of two regexp_replace scans over the
    ~1.5 KB payload — equivalent to entity-first-then-whitespace because
    a single non-overlapping sweep removes exactly the contiguous
    ``&#13;`` runs the first pass would have, and removal of either
    pattern cannot create a new match for the other within one pass.
    """
    return F.regexp_replace(cert, r"&#13;|\s", "")


def signature_struct(cert: Column) -> Column:
    """X3: ``struct<issuer,subject,valid_until,fingerprint>``; NULL when no cert.

    An undecodable payload (non-base64 alphabet / bad length) takes the
    reference's catch-path defaults.
    """
    clean = clean_cert(cert)
    decodable = (
        clean.rlike("^[A-Za-z0-9+/]+={0,2}$") & (F.length(clean) % 4 == 0)
    )
    decoded_bin = F.unbase64(clean)
    decoded = decoded_bin.cast("string")

    grouped = F.regexp_replace(F.upper(F.sha2(decoded_bin, 256)), "(..)", "$1:")
    fingerprint = F.regexp_replace(grouped, ":$", "")

    cn = F.nullif(F.regexp_extract(decoded, "CN=([^,]+)", 1), F.lit(""))
    o = F.nullif(F.regexp_extract(decoded, "O=([^,]+)", 1), F.lit(""))
    dates = F.regexp_extract_all(decoded, F.lit(ASN1_DATE_RE), 0)
    second = F.try_element_at(dates, F.lit(2))
    valid_until = F.when(
        F.size(dates) >= 2,
        F.concat(
            F.lit("20"),
            F.substring(second, 1, 2),
            F.lit("-"),
            F.substring(second, 3, 2),
            F.lit("-"),
            F.substring(second, 5, 2),
        ),
    ).otherwise(F.lit(CERT_DEFAULT_VALID_UNTIL))

    ok = F.struct(
        F.coalesce(F.trim(cn), F.lit(CATCH_ISSUER)).alias("issuer"),
        F.coalesce(F.trim(o), F.lit(CERT_DEFAULT_SUBJECT)).alias("subject"),
        valid_until.alias("valid_until"),
        F.coalesce(F.nullif(fingerprint, F.lit("")), F.lit("Unknown")).alias(
            "fingerprint"
        ),
    )
    fallback = F.struct(
        F.lit(CERT_DEFAULT_ISSUER).alias("issuer"),
        F.lit(CERT_DEFAULT_SUBJECT).alias("subject"),
        F.lit(CERT_DEFAULT_VALID_UNTIL).alias("valid_until"),
        F.lit("Unknown").alias("fingerprint"),
    )
    return F.when(
        cert.isNull() | (F.length(clean) == 0), F.lit(None).cast(
            "struct<issuer:string,subject:string,valid_until:string,fingerprint:string>"
        )
    ).otherwise(F.when(decodable, ok).otherwise(fallback))
