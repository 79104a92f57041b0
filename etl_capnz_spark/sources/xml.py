"""X1: CAP 1.2 XML → flattened alert rows (SURVEY.md §2.3).

Spark 4's built-in ``from_xml`` does the structural parse JVM-side (no
UDF); the permissive field coalescing (every missing field → '',
task.ts:420-448) and the required-field null-out (no <info> or missing
identifier/sender/sent → null record, task.ts:427-434) are plain column
expressions on top. A syntactically broken document yields a null struct —
the reference's try/catch-continue (task.ts:549-552) becomes a filterable
null, so one bad alert never kills the batch.

For environments without ``from_xml`` an Arrow-batched ``mapInPandas``
fallback using the Python stdlib parser provides the same output schema
(``parse_cap_xml(..., force_fallback=True)``).

Reference parser config: fast-xml-parser, ignoreAttributes=false,
attributeNamePrefix='@' (task.ts:411); attributes play no role in the
extracted fields, so the schema simply omits them.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

CAP_XML_SCHEMA = (
    "struct<"
    "identifier:string, sender:string, sent:string, status:string,"
    "msgType:string, scope:string,"
    "info:struct<"
    "  category:string, event:string, urgency:string, severity:string,"
    "  certainty:string, senderName:string, headline:string,"
    "  description:string, instruction:string, responseType:string,"
    "  onset:string, expires:string, web:string,"
    "  area:struct<areaDesc:string, polygon:array<string>, circle:string>,"
    "  parameter:array<struct<valueName:string, value:string>>"
    ">,"
    "Signature:struct<KeyInfo:struct<X509Data:struct<X509Certificate:string>>>"
    ">"
)

#: Flattened alert columns produced by parse_cap_xml — matches the alert
#: table shape consumed by operators/features.build_features.
ALERT_COLUMNS = [
    "identifier",
    "sender",
    "sent",
    "status",
    "msg_type",
    "scope",
    "category",
    "event",
    "urgency",
    "severity",
    "certainty",
    "sender_name",
    "headline",
    "description",
    "instruction",
    "response_type",
    "onset",
    "expires",
    "web",
    "area_desc",
    "polygons",
    "circle",
    "parameters",
    "x509_certificate",
]


def _blank(col: Column) -> Column:
    return F.coalesce(col, F.lit(""))


#: output column → (top-level | info | area leaf) mapping used to build a
#: PRUNED from_xml schema: from_xml has no automatic nested-schema
#: pruning — parse cost scales with the DECLARED schema, not the consumed
#: columns (measured 9x on this box: 3.6 s full vs 0.4 s three-leaf at
#: sf0.1) — so consumers that need a field subset should say so.
_LEAF = {
    "identifier": ("top", "identifier:string"),
    "sender": ("top", "sender:string"),
    "sent": ("top", "sent:string"),
    "status": ("top", "status:string"),
    "msg_type": ("top", "msgType:string"),
    "scope": ("top", "scope:string"),
    "category": ("info", "category:string"),
    "event": ("info", "event:string"),
    "urgency": ("info", "urgency:string"),
    "severity": ("info", "severity:string"),
    "certainty": ("info", "certainty:string"),
    "sender_name": ("info", "senderName:string"),
    "headline": ("info", "headline:string"),
    "description": ("info", "description:string"),
    "instruction": ("info", "instruction:string"),
    "response_type": ("info", "responseType:string"),
    "onset": ("info", "onset:string"),
    "expires": ("info", "expires:string"),
    "web": ("info", "web:string"),
    "area_desc": ("area", "areaDesc:string"),
    "polygons": ("area", "polygon:array<string>"),
    "circle": ("area", "circle:string"),
    "parameters": (
        "info",
        "parameter:array<struct<valueName:string, value:string>>",
    ),
    "x509_certificate": ("sig", ""),
}


def pruned_cap_schema(fields: list[str]) -> str:
    """CAP schema restricted to ``fields`` (ALERT_COLUMNS names) plus the
    required-validity leaves (identifier/sender/sent and one info leaf —
    the drop predicate needs them regardless of the projection)."""
    want = set(fields) | {"identifier", "sender", "sent", "category"}
    top = [
        leaf
        for c, (sec, leaf) in _LEAF.items()
        if sec == "top" and c in want
    ]
    info = [
        leaf
        for c, (sec, leaf) in _LEAF.items()
        if sec == "info" and c in want
    ]
    areal = [
        leaf
        for c, (sec, leaf) in _LEAF.items()
        if sec == "area" and c in want
    ]
    if areal:
        info.append(f"area:struct<{', '.join(areal)}>")
    parts = top + [f"info:struct<{', '.join(info)}>"]
    if "x509_certificate" in want:
        parts.append(
            "Signature:struct<KeyInfo:struct<X509Data:"
            "struct<X509Certificate:string>>>"
        )
    return f"struct<{', '.join(parts)}>"


def parse_cap_xml(
    df: DataFrame,
    xml_col: str = "xml",
    force_fallback: bool = False,
    fields: list[str] | None = None,
) -> DataFrame:
    """Parse CAP XML strings into flattened alert rows (ALERT_COLUMNS).

    Rows that fail the reference's structural requirements (no alert root,
    no <info>, empty identifier/sender/sent) are DROPPED, mirroring
    parseXML's null-return + caller continue (task.ts:427-434, 632-634).

    ``fields``: optional projection pushdown INTO the parse — from_xml
    has no automatic nested-schema pruning, so declaring only the
    consumed leaves is the engine's column-pruning step for XML (same
    idea as ReadSchema pruning on parquet; ~proportional parse savings).
    Field values and drop semantics are identical to the full parse;
    only the set of output columns narrows. The stdlib fallback path
    always parses fully (it is already the slow path).
    """
    if fields is not None:
        unknown = set(fields) - set(ALERT_COLUMNS)
        if unknown:
            raise ValueError(f"unknown alert columns: {sorted(unknown)}")
    if force_fallback:
        parsed = _parse_fallback(df, xml_col)
    else:
        schema = (
            CAP_XML_SCHEMA if fields is None else pruned_cap_schema(fields)
        )
        # once_per_row barrier: the downstream projection references the
        # parsed struct ~12 times, and optimizer rewrites would re-run
        # the (non-codegen) from_xml per reference — measured 10x
        # (2.05 s vs 0.22 s single-ref at sf0.1). See functions/exprs.py.
        from etl_capnz_spark.functions.exprs import once_per_row

        parsed = df.select(
            "*",
            once_per_row(F.from_xml(F.col(xml_col), schema)).alias("_a"),
        )

    a = F.col("_a")
    info = a["info"]
    area = info["area"]
    exprs = {
        "identifier": _blank(a["identifier"]),
        "sender": _blank(a["sender"]),
        "sent": _blank(a["sent"]),
        "status": _blank(a["status"]),
        "msg_type": _blank(a["msgType"]),
        "scope": _blank(a["scope"]),
        "category": _blank(info["category"]),
        "event": _blank(info["event"]),
        "urgency": _blank(info["urgency"]),
        "severity": _blank(info["severity"]),
        "certainty": _blank(info["certainty"]),
        "sender_name": _blank(info["senderName"]),
        "headline": _blank(info["headline"]),
        "description": _blank(info["description"]),
        "instruction": _blank(info["instruction"]),
        "response_type": _blank(info["responseType"]),
        "onset": _blank(info["onset"]),
        "expires": _blank(info["expires"]),
        "web": _blank(info["web"]),
        "area_desc": _blank(area["areaDesc"]),
        "polygons": F.coalesce(
            area["polygon"], F.expr("cast(array() as array<string>)")
        ),
        "circle": _blank(area["circle"]),
        "parameters": F.coalesce(
            F.transform(
                info["parameter"],
                lambda p: F.struct(
                    p["valueName"].alias("value_name"),
                    p["value"].alias("value"),
                ),
            ),
            F.expr(
                "cast(array() as array<struct<value_name:string,value:string>>)"
            ),
        ),
        "x509_certificate": a["Signature"]["KeyInfo"]["X509Data"][
            "X509Certificate"
        ],
    }
    emit = ALERT_COLUMNS if fields is None else [
        c for c in ALERT_COLUMNS if c in fields
    ]
    out = parsed.select(
        "*",
        *[exprs[c].alias(c) for c in emit],
        (
            a.isNotNull()
            & info.isNotNull()
            & (_blank(a["identifier"]) != "")
            & (_blank(a["sender"]) != "")
            & (_blank(a["sent"]) != "")
        ).alias("_valid"),
    )
    return out.filter(F.col("_valid")).drop("_a", "_valid")


def _parse_fallback(df: DataFrame, xml_col: str) -> DataFrame:
    """stdlib-XML fallback: same nested-struct output via mapInPandas."""
    out_schema = f"_a {CAP_XML_SCHEMA}"
    passthrough = [c for c in df.columns]
    full_schema = ", ".join(
        f"`{c}` {t}" for c, t in df.dtypes
    ) + f", _a {CAP_XML_SCHEMA}"

    def _parse_batch(batches: Iterator) -> Iterator:
        import xml.etree.ElementTree as ET

        import pandas as pd

        def strip_ns(tag: str) -> str:
            return tag.rsplit("}", 1)[-1]

        def to_dict(el) -> dict:
            children = list(el)
            if not children:
                return el.text
            d: dict = {}
            for ch in children:
                tag = strip_ns(ch.tag)
                val = to_dict(ch)
                if tag in d:
                    if not isinstance(d[tag], list):
                        d[tag] = [d[tag]]
                    d[tag].append(val)
                else:
                    d[tag] = val
            return d

        def parse_one(text):
            try:
                root = ET.fromstring(text)
            except Exception:
                return None
            if strip_ns(root.tag) != "alert":
                return None
            d = to_dict(root)
            if not isinstance(d, dict):
                return None

            def g(m, k):
                v = m.get(k) if isinstance(m, dict) else None
                return v if isinstance(v, str) else None

            info = d.get("info")
            info = info[0] if isinstance(info, list) else info
            area = info.get("area") if isinstance(info, dict) else None
            area = area[0] if isinstance(area, list) else area
            poly = area.get("polygon") if isinstance(area, dict) else None
            if isinstance(poly, str):
                poly = [poly]
            params = info.get("parameter") if isinstance(info, dict) else None
            if isinstance(params, dict):
                params = [params]
            if isinstance(params, list):
                params = [
                    (g(p, "valueName"), g(p, "value"))
                    for p in params
                    if isinstance(p, dict)
                ]
            sig = d.get("Signature")
            cert = None
            if isinstance(sig, dict):
                ki = sig.get("KeyInfo")
                xd = ki.get("X509Data") if isinstance(ki, dict) else None
                cert = g(xd, "X509Certificate") if isinstance(xd, dict) else None
            return (
                g(d, "identifier"),
                g(d, "sender"),
                g(d, "sent"),
                g(d, "status"),
                g(d, "msgType"),
                g(d, "scope"),
                (
                    g(info, "category"),
                    g(info, "event"),
                    g(info, "urgency"),
                    g(info, "severity"),
                    g(info, "certainty"),
                    g(info, "senderName"),
                    g(info, "headline"),
                    g(info, "description"),
                    g(info, "instruction"),
                    g(info, "responseType"),
                    g(info, "onset"),
                    g(info, "expires"),
                    g(info, "web"),
                    (
                        (g(area, "areaDesc"), poly, g(area, "circle"))
                        if isinstance(area, dict)
                        else None
                    ),
                    params,
                )
                if isinstance(info, dict)
                else None,
                # Signature → KeyInfo → X509Data → X509Certificate nesting
                (((cert,),),) if cert is not None else None,
            )

        for pdf in batches:
            pdf = pdf.copy()
            pdf["_a"] = [parse_one(x) for x in pdf[xml_col]]
            yield pdf

    return df.mapInPandas(_parse_batch, full_schema)


def with_timestamps(df: DataFrame) -> DataFrame:
    """Derive ``sent_ts`` / ``onset_ts`` / ``expires_ts`` from the CAP
    ISO-8601 string fields — the adapter between the raw parse (strings,
    '' when absent) and the timestamp-typed operators (T6 expiry filter,
    C4/C5 formatting, feature fan-out).

    ``try_to_timestamp`` keeps the T8 per-record error-isolation
    discipline under ANSI mode: an unparseable timestamp becomes NULL
    (→ the alert flows to the defaults/fallback paths) instead of
    failing the job.
    """
    out = df
    for c in ("sent", "onset", "expires"):
        out = out.withColumn(
            f"{c}_ts",
            F.try_to_timestamp(F.nullif(F.col(c), F.lit(""))),
        )
    return out
