"""Text analysis for training-data pipelines (north-star extension,
SURVEY.md §2.12): quality scoring, language ID, token statistics, document
fingerprinting.

Everything is a per-row Catalyst expression (no shuffle, no Python) except
``token_frequencies`` which is the canonical explode → hash-aggregate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..session import engine_checkpoint

# Tiny per-language stopword lists for the n-gram/stopword-ratio heuristic.
# Deterministic and dialect-portable; real deployments swap in fastText —
# the plumbing (score-per-language → argmax) is identical.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "that", "it", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "por", "con", "los"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "den", "ein", "zu"],
    "fr": ["le", "la", "les", "de", "et", "un", "une", "est", "que", "pour"],
}


def tokens(col: Column) -> Column:
    """Whitespace tokenization of lowercased text."""
    return F.filter(
        F.split(F.lower(F.trim(col)), r"\s+"), lambda t: t != F.lit("")
    )


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


# GPT-2-style pre-tokenizer pattern (contractions, letter runs, digit runs,
# punctuation runs, whitespace) — the BPE-ish token-count estimator; RE2-
# compatible (no lookaheads) so the oracle runs the same pattern.
BPE_TOKEN_RE = r"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+"


def bpe_tokens(col: Column) -> Column:
    """BPE-ish pre-tokenization of raw text (no lowercasing — byte-level
    BPE is case-sensitive)."""
    return F.regexp_extract_all(col, F.lit(BPE_TOKEN_RE), 0)


def bpe_token_count(col: Column) -> Column:
    return F.size(bpe_tokens(col))


def quality_metrics(df: DataFrame, text_col: str) -> DataFrame:
    """Per-document quality features: length, token stats, punctuation and
    digit ratios, mean token length — the standard cheap pre-filters of a
    corpus pipeline."""
    t = F.col(text_col)
    toks = tokens(t)
    n_chars = F.length(t)
    n_tokens = F.size(toks)
    n_punct = n_chars - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    n_digit = n_chars - F.length(F.regexp_replace(t, r"[0-9]", ""))
    total_tok_len = F.aggregate(
        toks, F.lit(0), lambda acc, x: acc + F.length(x)
    )
    return df.withColumns(
        {
            "n_chars_q": n_chars,
            "n_tokens": n_tokens,
            "punct_ratio": F.round(
                n_punct.cast("double") / F.greatest(n_chars, F.lit(1)), 6
            ),
            "digit_ratio": F.round(
                n_digit.cast("double") / F.greatest(n_chars, F.lit(1)), 6
            ),
            "mean_token_len": F.round(
                total_tok_len.cast("double") / F.greatest(n_tokens, F.lit(1)), 6
            ),
        }
    )


def language_scores(col: Column) -> dict[str, Column]:
    """Stopword-hit count per language (the score of the lang-ID argmax)."""
    toks = tokens(col)
    out = {}
    for lang, words in LANG_STOPWORDS.items():
        stop = F.array(*[F.lit(w) for w in words])
        out[lang] = F.size(
            F.filter(toks, lambda t: F.array_contains(stop, t))
        )
    return out


def detect_language(col: Column) -> Column:
    """Argmax of stopword hits, ties broken by language-code order;
    'und' (undetermined) when no stopword hits at all."""
    scores = language_scores(col)
    best_lang = F.lit("und")
    best_score = F.lit(0)
    for lang in sorted(scores):  # later langs must beat, not tie
        s = scores[lang]
        better = s > best_score
        best_lang = F.when(better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(better, s).otherwise(best_score)
    return best_lang


def fingerprint(col: Column) -> Column:
    """Canonical-form document fingerprint: lowercase, collapse whitespace,
    strip punctuation, then md5 — the classic near-exact dedup key."""
    canon = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(col), r"[^\w\s]", ""), r"\s+", " "
        )
    )
    return F.md5(canon)


# PII scrubbing patterns — RE2-compatible (no lookaround/backrefs) so the
# DuckDB oracle runs the SAME regex text. Deliberately conservative stand-ins
# for a production PII pass (presidio-class recognizers slot into the same
# regexp_replace pipeline shape).
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
# 8+ digits allowing single space/dash/dot separators, optional +prefix —
# phone-ish numbers and other long identifiers.
PII_NUMBER_RE = r"\+?\d(?:[ .-]?\d){7,}"


def redact_pii(col: Column) -> Column:
    """Replace emails then long digit sequences with typed placeholder
    tags. Order matters (emails may contain digits); pure narrow
    regexp_replace — no shuffle, vectorized JVM-side."""
    no_email = F.regexp_replace(col, PII_EMAIL_RE, "<EMAIL>")
    return F.regexp_replace(no_email, PII_NUMBER_RE, "<NUMBER>")


def pii_counts(col: Column) -> tuple[Column, Column]:
    """(n_emails, n_numbers) found in the raw text — audit counters for
    the redaction pass."""
    n_email = F.size(F.regexp_extract_all(col, F.lit(PII_EMAIL_RE), 0))
    n_number = F.size(
        F.regexp_extract_all(
            F.regexp_replace(col, PII_EMAIL_RE, "<EMAIL>"),
            F.lit(PII_NUMBER_RE),
            0,
        )
    )
    return n_email, n_number


# Tiny sentiment lexicon over the corpus vocabulary — a stand-in for
# VADER/AFINN; the operator shape (broadcast dim join on exploded tokens +
# re-aggregate) is what matters at scale.
SENTIMENT_LEXICON: dict[str, int] = {
    "fast": 2,
    "slow": -2,
    "big": 1,
    "small": -1,
    "error": -3,
}


def sentiment_scores(
    df: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """Lexicon sentiment: Σ lexicon[token] over all token occurrences.

    Explode → broadcast join against the (tiny) lexicon → hash re-aggregate
    on the document id. The join is broadcast by construction; the
    re-aggregation is partial+final, so the shuffle carries one partial
    sum per (partition, doc)."""
    spark = df.sparkSession
    lex = F.broadcast(
        spark.createDataFrame(
            list(SENTIMENT_LEXICON.items()), "token string, weight int"
        )
    )
    toks = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("token")
    )
    return (
        toks.join(lex, "token", "left")
        .groupBy(id_col)
        .agg(
            F.sum(F.coalesce(F.col("weight"), F.lit(0)))
            .cast("bigint")
            .alias("sentiment")
        )
    )


def tf_idf(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact TF-IDF per (doc, token): tf × ln((N+1)/(df+1)).

    Two aggregations sharing the token key: term frequency per (doc,
    token), document frequency per token (distinct docs), then a join on
    token. N (corpus size) is itself a 1-row aggregate joined in by
    broadcast — NOT a driver-side ``df.count()``, which would force a full
    extra scan of the corpus before the real job (two passes at 100 TB).
    Here all three aggregates run inside one job and the corpus is scanned
    once per aggregation, never eagerly.
    """
    toks = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("token")
    )
    n = df.agg(F.count(F.lit(1)).alias("_n_docs"))
    tf = toks.groupBy(id_col, "token").agg(F.count("*").alias("tf"))
    dfreq = toks.groupBy("token").agg(
        F.countDistinct(id_col).alias("df")
    )
    # (N+1)/(df+1) with N carried as a column: same doubles as the former
    # float literal (bigint + 1.0 is exact far beyond any corpus size).
    idf = F.log(
        (F.col("_n_docs") + F.lit(1.0)) / (F.col("df") + F.lit(1.0))
    )
    return (
        tf.join(dfreq, "token")
        .crossJoin(F.broadcast(n))
        .select(
            id_col,
            "token",
            "tf",
            F.round(F.col("tf") * idf, 6).alias("tfidf"),
        )
    )


def repetition_metrics(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Gopher-style repetition signals per document: top/duplicate token
    fraction and top/duplicate bigram fraction — the standard "excessive
    repetition" quality filters of a pre-training corpus pipeline
    (Rae et al. 2021 §A1.1 use the same family of signals).

    Distributed shape: explode to (doc, gram) → two-phase hash aggregate on
    (doc, gram) → per-doc re-aggregate. Only (id, gram, count) tuples ever
    shuffle, and the second aggregate rides the partitioning of the first
    (both group on ``id``), so the re-aggregate is a no-exchange follow-up.
    A per-row HOF variant (array_distinct + nested filter) would avoid the
    shuffle but is O(len²) per document — wrong for long documents.
    """
    t = F.col(text_col)
    from etl_capnz_spark.operators.dedup import word_shingles

    uni = df.select(F.col(id_col), F.explode(tokens(t)).alias("g"))
    big = df.select(F.col(id_col), F.explode(word_shingles(t, 2)).alias("g"))

    def per_doc(grams: DataFrame, name: str) -> DataFrame:
        c = grams.groupBy(id_col, "g").agg(F.count("*").alias("c"))
        return c.groupBy(id_col).agg(
            F.sum("c").cast("bigint").alias(f"n_{name}"),
            F.max("c").cast("bigint").alias(f"_top_{name}"),
            F.coalesce(F.sum(F.when(F.col("c") > 1, F.col("c"))), F.lit(0))
            .cast("bigint")
            .alias(f"_dup_{name}"),
        )

    def frac(num: Column, den: Column) -> Column:
        return F.round(num.cast("double") / F.greatest(den, F.lit(1)), 6)

    u = per_doc(uni, "tokens")
    b = per_doc(big, "bigrams")
    # Left join: a 1-token document has no bigrams (absent from b).
    nb = F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("bigint")
    return u.join(b, id_col, "left").select(
        F.col(id_col),
        "n_tokens",
        frac(F.col("_top_tokens"), F.col("n_tokens")).alias("top_token_frac"),
        frac(F.col("_dup_tokens"), F.col("n_tokens")).alias("dup_token_frac"),
        nb.alias("n_bigrams"),
        frac(F.coalesce(F.col("_top_bigrams"), F.lit(0)), nb).alias(
            "top_bigram_frac"
        ),
        frac(F.coalesce(F.col("_dup_bigrams"), F.lit(0)), nb).alias(
            "dup_bigram_frac"
        ),
    )


def unigram_logprob(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Corpus-self-trained unigram LM score per document: mean ln p(token)
    with add-one (Laplace) smoothing — the cheap perplexity-proxy quality
    filter of a pre-training pipeline (CCNet-style LM filtering uses the
    same shape with a real KenLM; the distributed plumbing is identical).

    p(t) = (count(t) + 1) / (total_tokens + vocab_size).

    Distributed shape: explode → two-phase hash aggregate builds the
    frequency table (|vocab| rows); the model's two scalars (total, V)
    re-aggregate that table to ONE row and broadcast; scoring joins the
    exploded tokens to the frequency table on the token key — an equi-join
    that AQE sizes at runtime (broadcast when the vocab is small, shuffle
    otherwise) — then re-aggregates per document. The corpus text itself
    never shuffles; only (id, token) pairs do.
    """
    toks = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("token")
    )
    freq = toks.groupBy("token").agg(F.count("*").alias("_cnt"))
    model = freq.agg(
        F.sum("_cnt").alias("_total"),
        F.count("*").alias("_vocab"),
    )
    logp = F.log(
        (F.col("_cnt") + F.lit(1.0))
        / (F.col("_total") + F.col("_vocab") + F.lit(0.0))
    )
    return (
        toks.join(freq, "token")
        .crossJoin(F.broadcast(model))
        .groupBy(id_col)
        .agg(
            F.count("*").cast("bigint").alias("n_tokens"),
            F.round(F.avg(logp), 6).alias("avg_logprob"),
        )
    )


def bigram_lm_perplexity(
    df: DataFrame, text_col: str, id_col: str, add_k: float = 0.5
) -> DataFrame:
    """Corpus-self-trained BIGRAM LM perplexity per document — the
    CCNet-style quality gate one rung above :func:`unigram_logprob`:
    p(w2|w1) = (c(w1 w2) + k) / (c(w1) + k·V) with add-k smoothing,
    ppl = exp(−mean ln p) over the doc's bigrams. High-perplexity docs
    (unusual word TRANSITIONS, not just unusual words) are the boilerplate/
    gibberish the unigram score misses.

    c(w1) is the unigram occurrence count (the standard approximation of
    the history count; exact history counts differ only by each doc's
    final token). Documents with < 2 tokens have no bigrams and are
    absent from the output — a pipeline treats "no evidence" upstream.

    Distributed shape mirrors unigram_logprob: two frequency tables
    (bigram, unigram) via two-phase hash aggregates; V is a 1-row
    broadcast; scoring joins the doc's exploded bigrams to both tables
    on their keys and re-aggregates per doc. Only (id, bigram) pairs
    shuffle, never text.
    """
    from etl_capnz_spark.operators.dedup import word_shingles

    bigrams = word_shingles(F.col(text_col), 2)
    doc_bgs = df.select(
        F.col(id_col), F.explode(bigrams).alias("bg")
    ).withColumn("w1", F.split(F.col("bg"), " ").getItem(0))
    big_freq = doc_bgs.groupBy("bg").agg(F.count("*").alias("_c12"))
    toks = df.select(F.explode(tokens(F.col(text_col))).alias("token"))
    uni_freq = toks.groupBy("token").agg(F.count("*").alias("_c1"))
    vocab = uni_freq.agg(F.count("*").alias("_v"))
    logp = F.log(
        (F.col("_c12") + F.lit(add_k))
        / (F.col("_c1") + F.lit(add_k) * F.col("_v"))
    )
    avg_lp = F.round(F.avg(logp), 6)
    return (
        doc_bgs.join(big_freq, "bg")
        .join(uni_freq, doc_bgs["w1"] == uni_freq["token"])
        .crossJoin(F.broadcast(vocab))
        .groupBy(id_col)
        .agg(
            F.count("*").cast("bigint").alias("n_bigrams"),
            avg_lp.alias("avg_logprob"),
            F.round(F.exp(-avg_lp), 4).alias("perplexity"),
        )
    )


def token_frequencies(df: DataFrame, text_col: str, top_n: int = 50) -> DataFrame:
    """Global top-N token frequencies: explode → two-phase hash aggregate.

    The partial (map-side) aggregation means the shuffle carries one row
    per distinct token per partition — not one per token occurrence.
    """
    return (
        df.select(F.explode(tokens(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "token")
        .limit(top_n)
    )


def chunk_tokens(
    df: DataFrame,
    text_col: str,
    id_col: str,
    window: int = 128,
    stride: int = 64,
) -> DataFrame:
    """Overlapping token-window chunking — the context-window splitter of
    a training-data / retrieval pipeline: each document becomes
    ``ceil(n_tokens / stride)`` chunks of up to ``window`` tokens, each
    chunk starting ``stride`` tokens after the previous (overlap =
    ``window - stride``). The final partial chunk is kept (training
    pipelines pad it; retrieval wants the tail text).

    Pure array HOFs: sequence() over starts + one posexplode per
    document — a narrow 1→k row generation with NO shuffle; chunk_idx is
    ``start / stride`` so it is deterministic without window functions.
    Empty/whitespace-only documents produce zero chunks.
    """
    if stride <= 0 or window <= 0:
        raise ValueError("window and stride must be positive")
    toks = tokens(F.col(text_col))
    n = F.size("_toks")
    starts = F.sequence(F.lit(0), n - 1, F.lit(stride))
    return (
        df.select(F.col(id_col), toks.alias("_toks"))
        .filter(F.size("_toks") > 0)
        .select(
            id_col,
            "_toks",
            F.explode(starts).alias("start"),
        )
        .select(
            id_col,
            (F.col("start") / stride).cast("int").alias("chunk_idx"),
            "start",
            F.array_join(
                F.slice("_toks", F.col("start") + 1, window), " "
            ).alias("chunk_text"),
            F.least(
                F.lit(window), F.size("_toks") - F.col("start")
            ).alias("n_chunk_tokens"),
        )
    )


def winnow_fingerprints(
    df: DataFrame,
    text_col: str,
    id_col: str,
    w: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (the MOSS algorithm, Schleimer/
    Wilkerson/Aiken SIGMOD'03): hash every 2-word shingle, slide a
    ``w``-gram window over the hash sequence, and in each window select
    the minimum hash — ties to the RIGHTMOST position. The distinct
    selected (position, hash) pairs are the document's fingerprints.

    The guarantee that makes this the plagiarism/near-dup standard: any
    shared token run of length ≥ w+1 between two documents contributes
    at least one IDENTICAL fingerprint hash to both — detection needs
    only an equi-join on the fingerprint hash, never a text comparison.
    Density is ~2/(w+1) of positions: the index is a tunable fraction of
    corpus size.

    Plan shape: shingle hashing is a narrow array expression; selection
    is ONE posexplode + ONE windowed ``min_by`` over a w-row frame (no
    self-join), and the distinct collapses selections on the same
    partition-local (id, position) keys — a single exchange on the doc
    id. Output: (id_col, fp_pos, fp_hash). The min_by ordering key is a
    fixed-width string ``lpad(gh)||lpad(10^8-1-pos)`` — lexicographic ==
    (hash asc, position desc), expressible identically in DuckDB, whose
    min_by cannot order by a struct.

    Tail windows (< w grams remaining) truncate the frame — they add
    deterministic extra selections near document end, a harmless
    superset mirrored exactly by the DuckDB oracle.
    """
    from etl_capnz_spark.operators.dedup import _base_hash52, word_shingles

    grams = df.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                word_shingles(F.col(text_col), 2),
                lambda s: _base_hash52(s),
            )
        ).alias("pos", "gh"),
    )
    frame = (
        Window.partitionBy(id_col).orderBy("pos").rowsBetween(0, w - 1)
    )
    order_key = F.concat(
        F.lpad(F.col("gh").cast("string"), 16, "0"),
        F.lpad((F.lit(10**8 - 1) - F.col("pos")).cast("string"), 8, "0"),
    )
    selected = grams.select(
        F.col(id_col),
        F.min_by(F.col("pos"), order_key).over(frame).alias("fp_pos"),
        F.min("gh").over(frame).alias("fp_hash"),
    )
    return selected.distinct()


def bm25_search(
    df: DataFrame,
    text_col: str,
    id_col: str,
    queries: DataFrame,
    query_id_col: str = "query_id",
    query_col: str = "query",
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 10,
) -> DataFrame:
    """Okapi BM25 top-k retrieval — the classical lexical ranker a
    training-data pipeline uses for benchmark decontamination probes,
    eval-set retrieval baselines, and hard-negative mining.

    score(D,Q) = Σ_{t∈Q} idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·|D|/avgdl))
    with the Robertson idf ln(1 + (N−df+0.5)/(df+0.5)) (always > 0).

    Scale shape — an inverted-index PROBE, not a scan-per-query: term
    stats (tf per (doc,token), df per token, |D| per doc) aggregate
    once; the query terms equi-join on token, so only the postings of
    queried terms flow into scoring (the plan has no cartesian /
    nested-loop node, pinned in tests). Corpus constants (N, avgdl)
    ride a 1-row broadcast — no driver count. Per-query top-k is a
    rank window over (rounded score, id) — deterministic
    cross-engine; the round-6 happens BEFORE ranking so the oracle
    agrees on ties.

    Output: (query_id, rank, id_col, score) — rank 1-based.
    """
    toks = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("token")
    )
    # lazy localCheckpoint: tf feeds THREE consumers (dl, df, the probe
    # join) and the per-arm replanning re-executed the tokenize+explode+
    # aggregate lineage once per arm (r9 plan sweep: 44 exchanges /
    # multiple corpus scans in text_bm25). Materialized once as compact
    # (id, token, tf) tuples; every later stage aggregates or probes it.
    tf = engine_checkpoint(
        toks.groupBy(id_col, "token").agg(F.count("*").alias("tf")),
        eager=False,
    )
    # dl and df derive from the (doc, token, tf) aggregate, NOT from a
    # re-tokenize: the corpus is exploded ONCE and every later stage
    # aggregates the much smaller per-(doc,token) triple. (tf rows are
    # distinct (doc, token) pairs, so count(*) per token IS the
    # document frequency.)
    dl = tf.groupBy(id_col).agg(F.sum("tf").alias("dl"))
    dfreq = tf.groupBy("token").agg(F.count("*").alias("df"))
    stats = df.agg(F.count(F.lit(1)).alias("_n")).crossJoin(
        dl.agg(F.avg("dl").alias("_avgdl"))
    )
    qtoks = queries.select(
        F.col(query_id_col),
        F.explode(tokens(F.col(query_col))).alias("token"),
    ).distinct()
    idf = F.log(
        F.lit(1.0)
        + (F.col("_n") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    tf_part = (
        F.col("tf") * F.lit(k1 + 1.0)
    ) / (
        F.col("tf")
        + F.lit(k1)
        * (
            F.lit(1.0 - b)
            + F.lit(b) * F.col("dl") / F.col("_avgdl")
        )
    )
    scored = (
        qtoks.join(tf, "token")
        .join(dfreq, "token")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
        .groupBy(query_id_col, id_col)
        .agg(F.round(F.sum(idf * tf_part), 6).alias("score"))
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("score"), F.col(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select(query_id_col, "rank", id_col, "score")
    )


def cdc_chunks(
    df: DataFrame,
    text_col: str,
    id_col: str,
    window: int = 8,
    mod: int = 64,
) -> DataFrame:
    """Content-defined chunking (the rsync/LBFS rolling-hash trick):
    a chunk boundary falls wherever the hash of the trailing ``window``
    characters is ≡ 0 (mod ``mod``), so boundaries are properties of
    the CONTENT — an insertion near the front shifts only the chunk it
    lands in, and every later chunk still hashes identically. That is
    the property fixed-width chunking lacks and the reason CDC is the
    chunker for dedup of *edited* documents (chunk_spans dedups exact
    repeats; token_window chunks for models; this one survives edits).

    Expression-only plan: the boundary scan is a ``transform`` +
    ``filter`` over ``sequence(window, len)`` INSIDE the row (no
    per-character explode — whole-stage codegen keeps it one
    projection), then one explode per CHUNK. md5 is the rolling hash
    stand-in — O(len·window) per doc instead of a true O(len) gear
    hash, the price of staying SQL-expressible and oracle-checkable;
    a production corpus would swap a mapInPandas gear kernel behind
    the same output contract. Average chunk ≈ ``mod`` chars.

    Docs shorter than ``window`` are one chunk (the sequence guard
    matters: ANSI sequence(w, len<w) throws, it doesn't return empty).
    Output: (id, chunk_idx, start, length, chunk_hash) — start
    1-based, chunk_hash = md5 of the chunk text.
    """
    length = F.length(F.col(text_col))
    win_hash = lambda i: F.conv(  # noqa: E731
        F.substring(
            F.md5(F.substring(F.col(text_col), i - window + 1, window)),
            1,
            13,
        ),
        16,
        10,
    ).cast("bigint")
    positions = F.when(
        length >= window, F.sequence(F.lit(window), length)
    ).otherwise(F.array().cast("array<int>"))
    bounds = F.filter(
        F.transform(
            positions,
            lambda i: F.when(win_hash(i) % mod == 0, i),
        ),
        lambda x: x.isNotNull(),
    )
    starts = F.concat(F.array(F.lit(0)), bounds)
    ends = F.concat(bounds, F.array(length))
    spans = F.filter(
        F.arrays_zip(
            starts.alias("prev"), ends.alias("end")
        ),
        lambda s: s["end"] > s["prev"],  # drop the empty tail span
    )
    base = df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col),
        F.col(text_col).alias("_t"),
        F.posexplode(spans).alias("chunk_idx", "_s"),
    )
    start = F.col("_s.prev") + 1
    clen = F.col("_s.end") - F.col("_s.prev")
    return base.select(
        id_col,
        "chunk_idx",
        start.alias("start"),
        clen.alias("length"),
        F.md5(F.substring(F.col("_t"), start, clen)).alias("chunk_hash"),
    )


def zipf_fit(df: DataFrame, text_col: str) -> DataFrame:
    """Zipf rank-frequency fit over the corpus vocabulary: OLS of
    ln(freq) on ln(rank). Natural text runs slope ≈ −1; strong
    deviation is a corpus-health smell (template/boilerplate floods
    flatten the head, OCR noise fattens the tail) — a one-row corpus
    diagnostic beside text_quality's per-doc scores.

    Shape: one tokenize+count aggregate to the VOCAB table (sublinear
    in the corpus — Heaps' law), a rank window over it (freq desc,
    token asc, deterministic), one closed-form OLS aggregate. The log
    sums are the only order-dependent floats; outputs round at 6dp.

    Output: 1 row (n_tokens, vocab, slope, intercept).
    """
    from pyspark.sql.window import Window

    freqs = (
        df.select(F.explode(tokens(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    from .rank import bounded_const_key

    # vocabulary-sized global rank — deliberate (the zipf fit needs the
    # total order; vocab ≪ corpus); warning-silent const key
    w = (
        Window.partitionBy(bounded_const_key(F.col("token")))
        .orderBy(F.desc("freq"), F.col("token"))
    )
    xy = freqs.withColumn("rank", F.row_number().over(w)).select(
        F.log(F.col("rank").cast("double")).alias("x"),
        F.log(F.col("freq").cast("double")).alias("y"),
        "freq",
    )
    agg = xy.agg(
        F.sum("freq").alias("n_tokens"),
        F.count(F.lit(1)).alias("vocab"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    n = F.col("vocab").cast("double")
    slope = (n * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        n * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    intercept = (F.col("sy") - slope * F.col("sx")) / n
    return agg.select(
        "n_tokens",
        "vocab",
        F.round(slope, 6).alias("slope"),
        F.round(intercept, 6).alias("intercept"),
    )


def source_kl(
    df: DataFrame, text_col: str, source_col: str
) -> DataFrame:
    """Per-source KL divergence KL(P_source ‖ P_corpus) over unigram
    distributions — the training-mix drift diagnostic: which source's
    token distribution sits furthest from the blend it feeds? (The
    quantile-normalization and temperature-mixture operators decide
    WEIGHTS; this measures the distributional distance that motivates
    them.) Finite by construction: the corpus includes every source,
    so P_corpus dominates P_source.

    Exactness: one (source, token) aggregate; source and corpus
    totals derive from window sums over it (no second scan); each KL
    term is exact-count ratios through one identical log tree; the
    per-source sum is the only order-dependent step (6dp).

    Output: (source, n_tokens, vocab, kl_nats).
    """
    from pyspark.sql.window import Window

    tf = (
        df.select(
            F.col(source_col).alias("source"),
            F.explode(tokens(F.col(text_col))).alias("token"),
        )
        .groupBy("source", "token")
        .agg(F.count(F.lit(1)).alias("nst"))
    )
    from .rank import bounded_const_key

    ws = Window.partitionBy("source")
    wt = Window.partitionBy("token")
    # (source, token) cell-table total; warning-silent const key
    wall = Window.partitionBy(bounded_const_key(F.col("token")))
    e = (
        tf.withColumn("ns", F.sum("nst").over(ws))
        .withColumn("nt", F.sum("nst").over(wt))
        .withColumn("n", F.sum("nst").over(wall))
    )
    # p_s = nst/ns, p_c = nt/n; term = p_s * ln((nst*n)/(ns*nt)) —
    # the integer-ratio arrangement (the mutual_information discipline)
    term = (F.col("nst") / F.col("ns").cast("double")) * F.log(
        (F.col("nst").cast("double") * F.col("n").cast("double"))
        / (F.col("ns").cast("double") * F.col("nt").cast("double"))
    )
    return (
        e.groupBy("source")
        .agg(
            F.max("ns").alias("n_tokens"),
            F.count(F.lit(1)).alias("vocab"),
            F.round(F.sum(term), 6).alias("kl_nats"),
        )
    )


def rouge2_pairs(
    docs: DataFrame,
    id_a_col: str,
    text_a_col: str,
    id_b_col: str,
    text_b_col: str,
) -> DataFrame:
    """ROUGE-2 overlap between PAIRED texts — the summarization-eval /
    near-dup-eval metric: clipped bigram-multiset overlap
    o = Σ_g min(count_a(g), count_b(g)), precision o/total_a, recall
    o/total_b, F1 = 2o/(total_a+total_b) (the harmonic identity when
    both sides share o).

    Shape: bigrams explode per side, count per (pair, gram), ONE
    equi-join on (pair, gram) computes the clipped intersection — a
    multiset intersection as a join+least, never a per-pair Python
    loop; totals ride separate key-only aggregates so zero-bigram
    texts (under 2 tokens) still emit a row (F1 NULL when both sides
    are empty). All counts exact integers; F1 is the one float,
    rounded 6dp.

    Input: one row per pair (id_a, text_a, id_b, text_b), and
    (id_a, id_b) MUST be unique — it is the grouping/join key, so a
    duplicated pair row would pool its bigram counts across the
    duplicates and fan the pooled overlap back onto each copy
    (inflated per-row overlap/F1). Callers with genuinely repeated id
    pairs must first mint a surrogate pair key
    (monotonically_increasing_id) and pass it as id_a or id_b; the
    built-in pair generators here (consecutive-doc_id joins) satisfy
    uniqueness by construction.
    """
    def grams(text_col: str) -> Column:
        t = tokens(F.col(text_col))
        # adjacent-token bigrams: zip the array with its own tail
        return F.zip_with(
            F.slice(t, 1, F.greatest(F.size(t) - 1, F.lit(0))),
            F.slice(t, 2, F.greatest(F.size(t) - 1, F.lit(0))),
            lambda a, b: F.concat_ws(" ", a, b),
        )

    pairs = docs.select(
        F.col(id_a_col).alias("id_a"),
        F.col(id_b_col).alias("id_b"),
        grams(text_a_col).alias("_ga"),
        grams(text_b_col).alias("_gb"),
    )
    ca = (
        pairs.select("id_a", "id_b", F.explode("_ga").alias("g"))
        .groupBy("id_a", "id_b", "g")
        .agg(F.count(F.lit(1)).alias("na"))
    )
    cb = (
        pairs.select("id_a", "id_b", F.explode("_gb").alias("g"))
        .groupBy("id_a", "id_b", "g")
        .agg(F.count(F.lit(1)).alias("nb"))
    )
    ov = (
        ca.join(cb, ["id_a", "id_b", "g"])
        .groupBy("id_a", "id_b")
        .agg(F.sum(F.least("na", "nb")).alias("overlap"))
    )
    totals = pairs.select(
        "id_a",
        "id_b",
        F.size("_ga").cast("bigint").alias("total_a"),
        F.size("_gb").cast("bigint").alias("total_b"),
    )
    j = (
        totals.join(ov, ["id_a", "id_b"], "left")
        .withColumn("overlap", F.coalesce("overlap", F.lit(0)))
    )
    denom = F.col("total_a") + F.col("total_b")
    return j.select(
        "id_a",
        "id_b",
        "overlap",
        "total_a",
        "total_b",
        F.when(
            denom > 0,
            F.round(
                F.lit(2.0) * F.col("overlap").cast("double")
                / denom.cast("double"),
                6,
            ),
        ).alias("rouge2_f1"),
    )


def _gradient_pass_arrow(
    feats: DataFrame,
    w: dict,
    n_features: int,
    nano: int,
    clamp: int,
) -> dict:
    """One full-batch gradient pass as per-partition Arrow partial sums.

    Bit-identical to the SQL pass (see lr_train_hashed): per labelled
    row, z = w[-1] + Σ_{j∈_b} w[j] (exact int), clamped to ±``clamp``;
    e = 5·10⁸ + trunc_div(z·10⁹, 2(10⁹+|z|)) − y·10⁹; e accumulates into
    the bias sum and into every distinct bucket of the row. Rows whose
    bucket array is NULL contribute NOTHING (matching the SQL pass,
    where explode(concat(array(-1), NULL)) emits zero rows); empty
    arrays contribute to the bias only. Exactness at any scale: batch
    sums stay in int64 with ≥1000× margin (≤10⁴ rows × 1.5·10⁹ |e|max)
    and cross-batch accumulation is arbitrary-precision Python int; the
    partials return as decimal(38,0) and are summed on the driver.
    Returns {feature: gradient_sum} with the bias at -1.
    """
    from decimal import Decimal

    w_list = [int(w[j]) for j in range(n_features)]
    bias = int(w[-1])

    def part(batches):
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        wv = np.asarray(w_list, dtype=np.int64)
        g_bias = 0
        g_bins = [0] * n_features
        # float64 bincount weights are exact only while per-slice sums
        # stay < 2^53: 10⁶ rows × 1.5·10⁹ |e|max = 1.5·10¹⁵ < 9·10¹⁵.
        # Arrow batches default to 10⁴ rows, so this never slices in
        # practice; it pins exactness against any batch-size conf.
        _MAX_ROWS = 1_000_000
        for whole in batches:
            for off in range(0, whole.num_rows, _MAX_ROWS):
                batch = whole.slice(off, _MAX_ROWS)
                y = batch.column("_y").to_numpy(
                    zero_copy_only=False
                ).astype(np.int64)
                b = batch.column("_b")
                valid = pc.is_valid(b).to_numpy(zero_copy_only=False)
                counts = (
                    pc.fill_null(pc.list_value_length(b), 0)
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64)
                )
                vals = (
                    pc.list_flatten(b)
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64)
                )
                # per-row Σ w[j]: prefix sums over the flat bucket list —
                # int64-exact per slice (|w|·tokens ≪ 2^63)
                cs = np.concatenate(
                    ([0], np.cumsum(wv[vals], dtype=np.int64))
                )
                ends = np.cumsum(counts, dtype=np.int64)
                z = bias + (cs[ends] - cs[ends - counts])
                zc = np.clip(z, -clamp, clamp)
                num = zc * nano
                den = 2 * (nano + np.abs(zc))
                # trunc-toward-zero division, matching SQL `div`
                q = np.abs(num) // den
                e = 500000000 + np.where(num >= 0, q, -q) - y * nano
                g_bias += int(e[valid].sum(dtype=np.int64))
                # bincount float64 is exact here: every e and every
                # partial sum is an integer < 2^53 within one slice
                e_rep = np.repeat(e, counts)
                if e_rep.size:
                    bb = np.bincount(
                        vals, weights=e_rep.astype(np.float64),
                        minlength=n_features,
                    )
                    for j in np.nonzero(bb)[0]:
                        g_bins[int(j)] += int(bb[j])
        out = [(-1, g_bias)] + [
            (j, g_bins[j]) for j in range(n_features)
        ]
        yield pa.RecordBatch.from_arrays(
            [
                pa.array([r[0] for r in out], pa.int64()),
                pa.array(
                    [Decimal(r[1]) for r in out], pa.decimal128(38, 0)
                ),
            ],
            names=["j", "g"],
        )

    g: dict = {}
    for row in feats.mapInArrow(part, "j long, g decimal(38,0)").collect():
        g[int(row["j"])] = g.get(int(row["j"]), 0) + int(row["g"])
    return g


def lr_train_hashed(
    docs: DataFrame,
    text_col: str,
    label_col: str,
    n_features: int = 32,
    iters: int = 10,
) -> DataFrame:
    """Distributed quality-classifier TRAINING — fastText-style
    logistic regression over hashed bag-of-words features, fit by
    ``iters`` full-batch gradient steps with the k-means collect
    discipline: each step aggregates ONE integer gradient vector
    (≤ n_features+1 values) to the driver, updates the weight vector
    there, and re-broadcasts it as literals into the next step's
    expression — the data never leaves the executors, the driver
    state is bounded by the feature count, and the whole trajectory
    is deterministic and oracle-replayable (the
    markov_removal_attribution integer-fixed-point discipline).

    Every arithmetic step is INTEGER so no partition-order-dependent
    float sum exists anywhere:

    * features: distinct ``hash32(token) % n_features`` buckets,
      binary presence — so the margin z = bias + Σ w_j is an EXACT
      integer sum of nano-unit weights;
    * the link is the rational sigmoid σ̃(x) = ½ + x/(2(1+|x|))
      (fastText itself uses a lookup-table sigmoid — the link's exact
      shape is not sacred, engine-identical replay is), computed as
      p_nano = 5·10⁸ + (z·10⁹) div (2(10⁹+|z|)) after clamping z to
      ±8·10⁹ nano (σ̃ saturates; the clamp keeps z·10⁹ inside int64);
      ``div``/``//`` truncate toward zero in BOTH engines;
    * per-row error e = p_nano − y·10⁹ is an integer; gradient sums
      accumulate in decimal(38,0)/HUGEINT (n·10⁹ passes int64 at
      n ≈ 9·10⁹ rows — the 100 TB rule); the update
      w_j ← w_j − trunc_div(G_j, n) is exact integer (lr = 1).

    Rows with a NULL label are UNLABELED — they carry no gradient, so
    they are filtered out before training and excluded from the
    divisor n (the pre-fix shape let them vanish from the gradient
    sums while still inflating n, silently diluting every update).

    Output: (feature, w_nano) — one row per hashed feature plus the
    bias at feature = −1, weights in nano units.
    """
    NANO = 1_000_000_000
    CLAMP = 8 * NANO
    toks = tokens(F.col(text_col))
    buckets = F.array_distinct(
        F.transform(
            toks,
            lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast(
                "bigint"
            )
            % n_features,
        )
    )
    feats = (
        docs.select(
            F.col(label_col).cast("long").alias("_y"),
            buckets.alias("_b"),
        )
        .filter(F.col("_y").isNotNull())
        .persist()
    )
    n = feats.count()
    # Scale-adaptive loop parallelism (opt r10, guide §2.2): every
    # iteration re-reads feats, and at bench scale (5 000 rows) the
    # inherited 32 near-empty partitions cost 32 task launches per
    # stage per iteration. Coalesce (narrow — reads the SAME cached
    # blocks, no shuffle, no recompute) to ceil(n / 1M) partitions —
    # data-sized, so a 100 TB corpus keeps full parallelism while a
    # small one stops paying fixed task overhead × iters. The
    # trajectory is partition-invariant (exact integer sums; pinned by
    # test_lr_train partition-invariance).
    _ROWS_PER_PARTITION = 1_000_000
    cur_p = feats.rdd.getNumPartitions()
    want_p = max(1, min(cur_p, (n + _ROWS_PER_PARTITION - 1)
                        // _ROWS_PER_PARTITION))
    if want_p < cur_p:
        feats = feats.coalesce(want_p)
    w = {j: 0 for j in range(-1, n_features)}
    # Gradient-pass implementation seam (opt r10, guide §4.2 + VERDICT
    # r9 #6): the literal-weights SQL pass rebuilds and Janino-compiles
    # a fresh weight-laden expression tree EVERY iteration — profiled at
    # ~half of text_lr_train's wall, and the query ran SLOWER at 32
    # cores than 8 (scaling ratio 0.81: the cost is the DRIVER, not the
    # data). The Arrow pass computes the identical integer gradient as
    # per-partition partial sums inside ONE mapInArrow (stable tiny
    # plan, no per-iteration codegen, no shuffle — partials are summed
    # exactly on the driver in arbitrary-precision ints). Same integer
    # math end to end: same z clamp, same trunc-toward-zero division,
    # same exclusion of NULL-bucket rows — the weight trajectory is
    # bit-identical (pinned by tests/test_lr_train.py::
    # test_gradient_pass_impls_identical and the DuckDB oracle).
    # NOTE (opt r9, negative result): shipping the weights as a
    # broadcast 1-row array table (crossJoin) instead of literals — so
    # the per-iteration plan is structurally identical and the codegen
    # stage could be reused — was A/B-measured SLOWER (sf0.1 cold-JVM
    # 6.8 -> 7.7 s): the per-iteration createDataFrame + broadcast
    # exchange + BNLJ overhead exceeds the saved planning/compile time
    # at this iteration count.
    import os as _os

    use_arrow = (
        _os.environ.get("SPARK_GRAFT_LR_GRAD", "arrow") == "arrow"
    )
    for _ in range(iters if n > 0 else 0):
        if use_arrow:
            g = _gradient_pass_arrow(feats, w, n_features, NANO, CLAMP)
            for j in w:
                gj = g.get(j, 0)
                q = abs(gj) // n
                w[j] -= q if gj >= 0 else -q
            continue
        w_arr = F.array(
            *[F.lit(w[j]).cast("long") for j in range(n_features)]
        )
        z = F.aggregate(
            F.col("_b"),
            F.lit(w[-1]).cast("long"),
            lambda acc, j: acc + F.element_at(w_arr, (j + 1).cast("int")),
        )
        zc = F.greatest(
            F.lit(-CLAMP).cast("long"),
            F.least(F.lit(CLAMP).cast("long"), z),
        )
        scored = feats.select(
            "_y", "_b", zc.alias("_zc")
        ).selectExpr(
            "_b",
            "(500000000 + (_zc * 1000000000)"
            " div (2 * (1000000000 + abs(_zc)))"
            " - _y * 1000000000) as _e",
        )
        contrib = scored.select(
            F.explode(
                F.concat(F.array(F.lit(-1).cast("bigint")), F.col("_b"))
            ).alias("j"),
            "_e",
        )
        # bounded driver state: ≤ n_features + 1 gradient sums
        g = {
            int(r["j"]): int(r["g"])
            for r in contrib.groupBy("j")
            .agg(F.sum(F.col("_e").cast("decimal(38,0)")).alias("g"))
            .collect()
        }
        for j in w:
            gj = g.get(j, 0)
            q = abs(gj) // n
            w[j] -= q if gj >= 0 else -q
    feats.unpersist()
    return docs.sparkSession.createDataFrame(
        sorted((j, w[j]) for j in w),
        "feature bigint, w_nano bigint",
    )


def ngram_novelty(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
) -> DataFrame:
    """Per-document n-gram novelty — the memorization-risk / staleness
    readout a corpus-curation pass runs before adding a document:
    what fraction of this doc's distinct word n-grams has the corpus
    NEVER seen in any earlier document (lower ``id_col``)? A copied
    press release scores ~0, boilerplate-heavy pages score low, and a
    genuinely new document scores near 1. Complements decontamination
    (overlap vs a FIXED benchmark set) and substring_span_dedup
    (position-exact removal): novelty is the per-doc summary SIGNAL,
    cheap enough to score the whole corpus every refresh.

    Exactness: a gram is novel for doc d iff min(doc id) over every
    document containing it equals d — ties (two docs introduce the
    same gram) credit only the earliest id, matching the
    first-occurrence discipline of dedup_lines_global. Ratios are
    exact integer counts divided once, 6dp.

    Scale shape: per-doc DISTINCT grams collapse inside the array
    (array_distinct, narrow) before anything shuffles, then exactly
    TWO exchanges of compact (16-byte gram hash, id) tuples: one
    groupBy(gram) for the global first-seen id, one groupBy(id) to
    re-aggregate the per-doc counts — document text never enters an
    Exchange. No window over data-sized tables; the first-seen table
    is gram-domain-sized.

    Docs with fewer than ``n`` tokens have no grams: they emit
    (n_grams=0, n_novel=0, novelty=NULL) — undefined, not 1.0.
    Output: (id_col, n_grams, n_novel, novelty).
    """
    from etl_capnz_spark.operators.dedup import word_shingles

    grams = df.select(
        F.col(id_col).alias("_id"),
        F.explode(
            F.array_distinct(word_shingles(F.col(text_col), n))
        ).alias("_g"),
    ).select("_id", F.md5(F.col("_g")).alias("_gh"))
    first = grams.groupBy("_gh").agg(F.min("_id").alias("_first"))
    per_doc = (
        grams.join(first, "_gh")
        .groupBy("_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_grams"),
            F.sum(
                (F.col("_id") == F.col("_first")).cast("int")
            )
            .cast("bigint")
            .alias("n_novel"),
        )
    )
    base = df.select(F.col(id_col).alias("_id"))
    counted = base.join(per_doc, "_id", "left").select(
        F.col("_id").alias(id_col),
        F.coalesce("n_grams", F.lit(0)).cast("bigint").alias("n_grams"),
        F.coalesce("n_novel", F.lit(0)).cast("bigint").alias("n_novel"),
    )
    return counted.withColumn(
        "novelty",
        F.when(
            F.col("n_grams") > 0,
            F.round(
                F.col("n_novel").cast("double")
                / F.col("n_grams").cast("double"),
                6,
            ),
        ),
    )


def vocab_coverage(
    df: DataFrame,
    text_col: str,
    id_col: str,
    top_n: int = 1000,
) -> DataFrame:
    """Tokenizer vocabulary coverage — the pre-training readout that
    decides whether a fixed vocab is big enough for a corpus slice:
    derive the top-``top_n`` tokens by global frequency (ties broken
    by token, a total order), then report per document how much of it
    falls outside that vocab, at occurrence AND type granularity.

    Scale shape: the vocab is bounded by the argument (top-N via
    TakeOrdered on the two-phase token counts — never a full sort),
    broadcast to the occurrence stream, one left join + one
    groupBy(doc). The explode is narrow; only (doc, token) pairs
    shuffle for the distinct-type counts. Documents with zero tokens
    produce no row (they have no coverage to measure).

    Output: (id_col, n_tokens, n_oov, n_types, n_oov_types, oov_rate)
    — oov_rate a single exact division, 6dp.
    """
    toks = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("token")
    )
    vocab = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("_n"))
        .orderBy(F.col("_n").desc(), "token")
        .limit(top_n)
        .select("token", F.lit(1).alias("_iv"))
    )
    flagged = toks.join(F.broadcast(vocab), "token", "left")
    oov = F.when(F.col("_iv").isNull(), 1).otherwise(0)
    return flagged.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        F.sum(oov).cast("bigint").alias("n_oov"),
        F.countDistinct("token").cast("bigint").alias("n_types"),
        F.countDistinct(
            F.when(F.col("_iv").isNull(), F.col("token"))
        ).cast("bigint").alias("n_oov_types"),
    ).withColumn(
        "oov_rate",
        F.round(
            F.col("n_oov").cast("double") / F.col("n_tokens").cast("double"),
            6,
        ),
    )
