"""HTML → main-text extraction (north-star extension, SURVEY.md §2.12).

The missing FIRST stage of a crawl→training-data pipeline (VERDICT r2
item 3): before quality scoring / dedup / packing, raw crawl HTML must be
reduced to its main text — markup stripped, entities decoded, and nav /
header / footer boilerplate removed. The reference's nearest analog is
its regex link extraction over feed markup (task.ts:563-578); this module
applies the same regex-over-markup discipline to whole documents.

Everything is a per-row Catalyst expression chain (regexp_replace /
split / filter / array_join) — no UDF, no shuffle: at 100 TB this runs
as a map-only rewrite of the crawl, whole-stage-codegen'd, with the text
column never leaving the JVM. All regexes are in the RE2 ∩ Java-regex
common subset ((?s)/(?i) inline flags, non-greedy quantifiers, NO
lookaround) so the DuckDB oracle can run character-identical rules.

Boilerplate model (classic line-density heuristic, cf. Kohlschütter's
boilerplate detection): element-level removal of nav/header/footer/aside
blocks, then a per-line word-count gate — real prose lines carry ≥
``min_words`` words, chrome lines ("Home | About | Contact", copyright
footers) almost never do.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Elements whose ENTIRE content is dropped: non-text payloads first
# (script/style), then structural chrome (nav/header/footer/aside).
# Expanded per element — RE2 (the oracle's regex engine) has no
# backreferences, so `</\1>` is not in the portable subset.
_DROP_BLOCK_RE = "(?is)" + "|".join(
    rf"<{t}\b.*?</{t}\s*>"
    for t in ("script", "style", "nav", "header", "footer", "aside")
)
_COMMENT_RE = r"(?s)<!--.*?-->"
# Block-level boundaries become newlines so line structure survives the
# tag strip; all other tags vanish inline.
_BLOCK_TAG_RE = (
    r"(?i)</?(p|div|br|li|ul|ol|h1|h2|h3|h4|h5|h6|tr|td|th|table|"
    r"section|article|blockquote|pre)\b[^>]*>"
)
_ANY_TAG_RE = r"(?s)<[^>]+>"

# Minimal entity table — the high-frequency named entities plus the
# numeric forms the reference itself handles (&#13; at task.ts:484).
_ENTITIES: list[tuple[str, str]] = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&nbsp;", " "),
    ("&#13;", "\r"),
    ("&amp;", "&"),  # LAST: &amp;lt; must decode to &lt;, not <
]


# Anchor href extraction — the crawl-frontier feed. Same regex-over-
# markup discipline as the reference's feed-link extraction
# (task.ts:563-578), RE2 ∩ Java portable (no lookaround).
_HREF_RE = r'<a\s[^>]*href="([^"]+)"'


def extract_links(col: Column) -> Column:
    """All anchor hrefs of an HTML column, in document order."""
    return F.regexp_extract_all(col, F.lit(_HREF_RE), 1)


def decode_entities(col: Column) -> Column:
    """Decode the common HTML entities (ordered chain, ``&amp;`` last)."""
    out = col
    for ent, ch in _ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(ch))
    return out


def strip_tags(col: Column) -> Column:
    """Markup → plain text: drop script/style/nav/header/footer/aside
    blocks and comments, turn block-tag boundaries into newlines, erase
    remaining tags, decode entities, and normalize intra-line spaces."""
    out = F.regexp_replace(col, _DROP_BLOCK_RE, "")
    out = F.regexp_replace(out, _COMMENT_RE, "")
    out = F.regexp_replace(out, _BLOCK_TAG_RE, "\n")
    out = F.regexp_replace(out, _ANY_TAG_RE, "")
    out = decode_entities(out)
    # collapse horizontal whitespace; line breaks are semantic here
    out = F.regexp_replace(out, r"[ \t\r]+", " ")
    return out


def main_text(col: Column, min_words: int = 5) -> Column:
    """Line-density boilerplate filter over stripped text: keep lines
    with ≥ ``min_words`` whitespace words, rejoin with single newlines."""
    lines = F.split(strip_tags(col), r"\n")
    kept = F.filter(
        # explicit arity-1 lambda, NEVER the bare F.trim reference:
        # trim(col, trimChars) has two params, so transform would bind
        # (element, index) and trim each line's own INDEX DIGITS off
        # its edges — latent through seven rounds of sf0.01 green and
        # caught by the round-9 full sf1.0 sweep when a replica-suffix
        # doc text ending "r2" landed on line index 2 (SURVEY rule 3)
        F.transform(lines, lambda l: F.trim(l)),
        lambda l: F.size(
            F.filter(F.split(l, r"\s+"), lambda t: t != F.lit(""))
        )
        >= F.lit(min_words),
    )
    return F.array_join(kept, "\n")


def extract_main_text(
    df: DataFrame,
    html_col: str = "html",
    out_col: str = "text",
    min_words: int = 5,
) -> DataFrame:
    """Attach the extracted main text of an HTML column.

    Map-only (one regexp chain per row); emits the extracted text plus
    ``n_lines_kept`` / ``extract_ratio`` audit columns so a pipeline can
    gate on extraction quality (a ratio near 0 means chrome-only pages;
    near 1 means the page was already plain text).
    """
    txt = main_text(F.col(html_col), min_words)
    return df.withColumn(out_col, txt).withColumn(
        "n_lines_kept",
        F.when(
            F.length(F.col(out_col)) > 0,
            F.size(F.split(F.col(out_col), r"\n")),
        ).otherwise(F.lit(0)),
    ).withColumn(
        "extract_ratio",
        F.round(
            F.length(F.col(out_col))
            / F.greatest(F.length(F.col(html_col)), F.lit(1)),
            6,
        ),
    )
