"""DuckDB-dialect oracle SQL generators.

The ANSI-SQL oracles for the C1-C3 lookup operators are generated from the
SAME Python constants the engine uses (functions/lookups.py), so the two
sides cannot drift. Everything here is plain SQL text construction — no
DuckDB import.
"""

from __future__ import annotations

from etl_capnz_spark.functions.lookups import (
    CATEGORY_MAP,
    DEFAULT_ICON,
    EVENT_MAP,
    ICON_MAP,
    ICON_PATTERNS,
    ICON_PREFIX,
    COLOR_MAP,
)


def _sq(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def case_map(col: str, mapping: dict[str, str], else_expr: str) -> str:
    """``CASE col WHEN k THEN v ... ELSE else_expr END``."""
    whens = " ".join(
        f"WHEN {_sq(k)} THEN {_sq(v)}" for k, v in mapping.items()
    )
    return f"CASE {col} {whens} ELSE {else_expr} END"


def category_desc_sql(col: str = "category") -> str:
    fallback = f"CASE WHEN {col} = '' THEN 'Unknown' ELSE {col} END"
    return case_map(col, CATEGORY_MAP, fallback)


def event_desc_sql(col: str = "event") -> str:
    fallback = f"CASE WHEN {col} = '' THEN 'Unknown' ELSE {col} END"
    return case_map(col, EVENT_MAP, fallback)


def event_icon_sql(
    event: str = "event",
    category: str = "category",
    severity: str = "severity",
    headline: str = "headline",
) -> str:
    """DuckDB CASE chain mirroring task.ts:189-253 precedence."""
    norm = f"regexp_replace(lower({event}), '[\\s-]+', '', 'g')"
    hnorm = f"coalesce(regexp_replace(lower({headline}), '[\\s-]+', '', 'g'), '')"
    parts = [
        f"WHEN {category} = 'Health' THEN 'Incidents/INC.60.GHS08.HealthHazard.png'",
        f"WHEN {category} = 'Fire' THEN 'Incidents/INC.35.Fire.png'",
        f"WHEN {event} IS NULL OR {event} = '' THEN {_sq(DEFAULT_ICON)}",
    ]
    for alternatives, key in ICON_PATTERNS:
        conds = " OR ".join(
            f"contains({probe}, {_sq(alt)})"
            for alt in alternatives
            for probe in (norm, hnorm)
        )
        parts.append(f"WHEN {conds} THEN {_sq(ICON_MAP.get(key, DEFAULT_ICON))}")
    direct_norm = case_map(norm, ICON_MAP, "NULL")
    direct_lower = case_map(f"lower({event})", ICON_MAP, "NULL")
    direct = f"coalesce({direct_norm}, {direct_lower})"
    parts.append(f"WHEN {direct} IS NOT NULL THEN {direct}")
    met_geo = f"{category} IN ('Met', 'Geo')"
    parts.append(
        f"WHEN {met_geo} AND {severity} IN ('Severe', 'Extreme')"
        " THEN 'Incidents/INC.38.NaturalDisaster1.Urgent.png'"
    )
    parts.append(
        f"WHEN {met_geo} AND {severity} = 'Moderate'"
        " THEN 'Incidents/INC.39.NaturalDisaster2.NonUrgent.png'"
    )
    parts.append(
        f"WHEN {met_geo} AND {severity} = 'Minor'"
        " THEN 'Incidents/INC.40.NaturalDisaster3.InformationOnly.png'"
    )
    chain = "CASE " + " ".join(parts) + f" ELSE {_sq(DEFAULT_ICON)} END"
    return f"{_sq(ICON_PREFIX)} || ({chain})"


def color_code_sql(params: str = "parameters") -> str:
    """X2 in DuckDB list-lambda SQL."""
    hex_first = (
        f"list_filter({params}, p -> p.value_name = 'ColourCodeHex')"
    )
    name_first = f"list_filter({params}, p -> p.value_name = 'ColourCode')"
    name_map = case_map(f"({name_first})[1].\"value\"", COLOR_MAP, "NULL")
    return (
        f"coalesce(({hex_first})[1].\"value\", "
        f"CASE WHEN len({name_first}) > 0 THEN {name_map} END)"
    )


# Shared DuckDB fragments for the signature oracle.
SIG_CLEAN = (
    "regexp_replace(replace(x509_certificate, '&#13;', ''), '\\s', '', 'g')"
)
SIG_DECODED = f"decode(from_base64({SIG_CLEAN}))"
ASN1_DATE_RE_SQL = r"(\d{2})(\d{2})(\d{2})(\d{2})(\d{2})(\d{2})Z"
