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


# --- extension-operator fragments (dedup / text / similarity) --------------

TOKENS_SQL = "string_split_regex(lower(trim({col})), '\\s+')"


def hash32_sql(expr: str) -> str:
    """First 32 md5 bits as BIGINT — mirrors dedup._hash32."""
    return f"('0x' || substr(md5({expr}), 1, 8))::BIGINT"


def shingles_sql(col: str) -> str:
    """2-word shingles — mirrors dedup.word_shingles(n=2)."""
    toks = TOKENS_SQL.format(col=col)
    return (
        f"list_transform(generate_series(1, greatest(len({toks}) - 1, 0)), "
        f"i -> ({toks})[i] || ' ' || ({toks})[i + 1])"
    )


def base52_sql(col: str) -> str:
    """First 52 md5 bits as BIGINT — mirrors dedup._base_hash52."""
    toks = shingles_sql(col)
    return (
        f"list_transform({toks}, "
        f"s -> ('0x' || substr(md5(s), 1, 13))::BIGINT)"
    )


def minhash_sql(col: str, seed: int) -> str:
    """Mirrors dedup.minhash_signature: universal hash family over one
    base hash per shingle, h_i(x) = (a_i*x + b_i) % 2^52."""
    a, b = 2 * seed + 1, seed * 97531 + 12345
    return (
        f"list_aggregate(list_transform(_mh_base, "
        f"x -> (x * {a} + {b}) % {1 << 52}), 'min')"
    )


def minhash_bands_sql(
    source: str,
    id_col: str,
    num_hashes: int = 8,
    bands: int = 4,
    with_sig: bool = False,
) -> str:
    """CTE text: sigs (id + mh0..mhN) and banded (id, band_key) — mirrors
    dedup.minhash_signatures + the banding in lsh_candidates.
    ``with_sig`` adds sig_key (full signature string) to banded, mirroring
    band_keys(with_sig=True)."""
    mh = ", ".join(
        f"{minhash_sql('text', s)} AS mh{s}" for s in range(num_hashes)
    )
    source = (
        f"(SELECT {id_col}, {base52_sql('text')} AS _mh_base FROM {source})"
    )
    rows_per_band = num_hashes // bands
    sig = ""
    if with_sig:
        full = " || ':' || ".join(
            f"mh{s}::VARCHAR" for s in range(num_hashes)
        )
        sig = f", {full} AS sig_key"
    arms = []
    for b in range(bands):
        cols = [f"mh{b * rows_per_band + r}" for r in range(rows_per_band)]
        key = " || ':' || ".join(f"{c}::VARCHAR" for c in cols)
        arms.append(
            f"SELECT {id_col} AS id, '{b}:' || {key} AS band_key{sig} FROM sigs"
        )
    banded = " UNION ALL ".join(arms)
    return f"sigs AS (SELECT {id_col}, {mh} FROM {source}), banded AS ({banded})"


def lsh_capped_sql(max_bucket: int) -> str:
    """CTE text (expects a ``banded(id, band_key, sig_key)`` CTE in scope):
    refined/c2 CTEs mirroring the two-level hot-bucket cap in
    dedup.lsh_candidates(max_bucket=...). Emits ``capped(id_a, id_b)``."""
    return f"""
            bcounts AS (
              SELECT band_key, count(*) AS bc FROM banded GROUP BY band_key),
            refined AS (
              SELECT id, CASE WHEN bc > {max_bucket}
                              THEN band_key || '#' || sig_key
                              ELSE band_key END AS bkey
              FROM banded JOIN bcounts USING (band_key)),
            c2 AS (SELECT bkey, count(*) AS c2 FROM refined GROUP BY bkey),
            r2 AS (SELECT id, bkey, c2 FROM refined JOIN c2 USING (bkey)),
            capped AS (
              SELECT a.id AS id_a, b.id AS id_b
              FROM r2 a JOIN r2 b USING (bkey)
              WHERE a.c2 <= {max_bucket} AND a.id < b.id
              UNION ALL
              SELECT id_a, id_b FROM (
                SELECT min(id) OVER (PARTITION BY bkey) AS id_a, id AS id_b
                FROM r2 WHERE c2 > {max_bucket})
              WHERE id_b > id_a)"""


def dot_sql(a: str, b: str) -> str:
    """Dot product mirroring similarity._dot's left fold bit-for-bit.
    DuckDB's native list_dot_product accumulates sequentially from 0.0
    — verified IDENTICAL doubles to the expanded
    list_reduce(list_prepend(0.0, products)) fold on the full
    embeddings table, and ~100× faster (the expanded fold made knn_srp
    the slowest verify-gate row: 32 planes × interpreted lambdas)."""
    return f"list_dot_product({a}, {b})"


def norm_sql(a: str) -> str:
    """sqrt(a·a) via the same native sequential kernel (order equals
    the x*x left fold it replaces — see dot_sql)."""
    return f"sqrt(list_dot_product({a}, {a}))"


def langid_sql(col: str) -> str:
    """Mirrors text.detect_language: earliest language attaining the max
    stopword-hit count; 'und' when all-zero."""
    from etl_capnz_spark.operators.text import LANG_STOPWORDS

    toks = TOKENS_SQL.format(col=col)
    counts = {}
    for lang in sorted(LANG_STOPWORDS):
        stop = ", ".join(_sq(w) for w in LANG_STOPWORDS[lang])
        counts[lang] = (
            f"len(list_filter({toks}, t -> list_contains([{stop}], t)))"
        )
    greatest = "greatest(" + ", ".join(counts.values()) + ")"
    whens = " ".join(
        f"WHEN {counts[lang]} = {greatest} THEN '{lang}'"
        for lang in sorted(LANG_STOPWORDS)
    )
    return f"CASE WHEN {greatest} = 0 THEN 'und' {whens} ELSE 'und' END"


def simhash_sql(col: str) -> str:
    """Mirrors dedup.simhash16 (16-bit majority vote over token hashes)."""
    toks = TOKENS_SQL.format(col=col)
    bits = []
    for j in range(16):
        h = hash32_sql("t")
        contrib = (
            f"list_reduce(list_prepend(0::BIGINT, list_transform({toks}, "
            f"t -> CASE WHEN ({h} & {1 << j}) > 0 THEN 1::BIGINT "
            f"ELSE (-1)::BIGINT END)), (a, b) -> a + b)"
        )
        bits.append(f"CASE WHEN {contrib} > 0 THEN {1 << j} ELSE 0 END")
    return "(" + " + ".join(bits) + ")::BIGINT"


def srp_sig_sql(vec: str, n_bits: int = 16, dim: int = 64) -> str:
    """n-bit SRP signature — mirrors similarity.srp_signature exactly:
    bit i set iff the left-fold dot(vec, plane_i) >= 0, planes md5-derived
    (similarity.srp_hyperplanes), literals via repr() so both engines
    parse the identical double."""
    from etl_capnz_spark.operators.similarity import srp_hyperplanes

    terms = []
    for i, plane in enumerate(srp_hyperplanes(n_bits, dim)):
        lit = "[" + ", ".join(repr(v) for v in plane) + "]::DOUBLE[]"
        terms.append(
            f"CASE WHEN {dot_sql(vec, lit)} >= 0 THEN {1 << i} ELSE 0 END"
        )
    return "(" + " + ".join(terms) + ")::BIGINT"


def srp_band_keys_sql(sig: str, n_bits: int = 16, bands: int = 2) -> list[str]:
    """Band-key expressions — mirrors similarity.srp_band_keys (integer
    div/mod, key = band*2^n_bits + band_value)."""
    bits_per = n_bits // bands
    width = 1 << bits_per
    return [
        f"({b} * {1 << n_bits} + (({sig}) // {width ** b}) % {width})"
        for b in range(bands)
    ]


def ngram_sql(col: str, n: int) -> str:
    """Word n-grams — mirrors dedup.word_shingles(col, n) for any n
    (indices bounded by the generate_series, so no OOB null concat)."""
    toks = TOKENS_SQL.format(col=col)
    parts = " || ' ' || ".join(f"({toks})[i + {j}]" for j in range(n))
    return (
        f"list_transform(generate_series(1, greatest(len({toks}) - {n - 1}, 0)), "
        f"i -> {parts})"
    )


def erfc_sql(x: str) -> str:
    """erfc(x) by the A&S 7.1.26 polynomial — mirrors
    mlmetrics.erfc_as's exact nesting order so both engines evaluate
    the identical float tree."""
    t = f"(1.0 / (1.0 + 0.3275911 * ({x})))"
    return (
        f"(((((1.061405429 * {t} + -1.453152027) * {t} "
        f"+ 1.421413741) * {t} + -0.284496736) * {t} "
        f"+ 0.254829592) * {t} * exp(-({x}) * ({x})))"
    )


def two_sided_p_sql(z: str) -> str:
    """Two-sided normal p — mirrors mlmetrics.two_sided_p."""
    return erfc_sql(f"abs({z}) / sqrt(2.0)")
