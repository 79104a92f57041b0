"""Remarks assembly C6 (SURVEY.md §2.6; task.ts:694-713, 839-858).

The reference builds an array of lines, drops whitespace-only entries with
``.filter(r => r.trim())`` and joins with newlines. Quirks preserved:

* ``'Description: ' + desc || ''`` — JS precedence means the prefix keeps the
  line truthy even for an empty description, so a bare ``'Description: '``
  line (with its trailing space) SURVIVES the filter. Same for Instruction.
* The intended blank separator line before the Digital Signature block is
  stripped by the same filter (task.ts:706/851) — so no blank line appears.
* Urgency/Severity/Certainty/Response fall back to ``'Unknown'`` BEFORE
  concatenation, Category/Event fall back inside their lookup (C1/C2).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from etl_capnz_spark.functions.lookups import category_description, event_description
from etl_capnz_spark.functions.timestamps import nz_local


def _unknown(col: Column) -> Column:
    return F.coalesce(F.nullif(col, F.lit("")), F.lit("Unknown"))


def remarks(
    description: Column,
    instruction: Column,
    category: Column,
    event: Column,
    urgency: Column,
    severity: Column,
    certainty: Column,
    response_type: Column,
    onset_ts: Column,
    expires_ts: Column,
    sig_subject: Column,
    sig_issuer: Column,
    sig_valid_until: Column,
    sig_fingerprint: Column,
    has_signature: Column,
) -> Column:
    """Build the remarks text block.

    ``onset_ts``/``expires_ts`` are TimestampType (null = absent);
    ``has_signature`` is a BooleanType column gating the signature block.
    """
    lines = F.array(
        F.concat(F.lit("Description: "), F.coalesce(description, F.lit(""))),
        F.concat(F.lit("Instruction: "), F.coalesce(instruction, F.lit(""))),
        F.concat(F.lit("Category: "), category_description(category)),
        F.concat(F.lit("Event: "), event_description(event)),
        F.concat(F.lit("Urgency: "), _unknown(urgency)),
        F.concat(F.lit("Severity: "), _unknown(severity)),
        F.concat(F.lit("Certainty: "), _unknown(certainty)),
        F.concat(F.lit("Response: "), _unknown(response_type)),
        F.when(onset_ts.isNotNull(), F.concat(F.lit("Onset: "), nz_local(onset_ts))),
        F.when(
            expires_ts.isNotNull(), F.concat(F.lit("Expires: "), nz_local(expires_ts))
        ),
        # The blank separator '' is built then stripped by the trim-filter —
        # kept here for fidelity to the construction (task.ts:706).
        F.when(has_signature, F.lit("")),
        F.when(has_signature, F.lit("Digital Signature")),
        F.when(has_signature, F.concat(F.lit("Name: "), _unknown(sig_subject))),
        F.when(has_signature, F.concat(F.lit("Issuer: "), _unknown(sig_issuer))),
        F.when(
            has_signature, F.concat(F.lit("Valid Until: "), _unknown(sig_valid_until))
        ),
        F.when(
            has_signature, F.concat(F.lit("Fingerprint: "), _unknown(sig_fingerprint))
        ),
    )
    kept = F.filter(
        lines, lambda r: r.isNotNull() & (F.trim(r) != F.lit(""))
    )
    return F.array_join(kept, "\n")
