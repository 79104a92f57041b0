"""Distributed unigram-LM (SentencePiece-style) tokenizer training
(VERDICT r8 next-round #8): the second of the two tokenizer families a
modern pipeline trains (Kudo 2018, "Subword Regularization"; the BPE
twin is operators/bpe.py). Where BPE grows a vocabulary bottom-up by
merging, unigram starts from a LARGE seed of candidate pieces and
shrinks it by EM: segment every word with the current piece
probabilities (Viterbi), recount pieces from the segmentations, prune
to the target size, repeat.

Spark mapping (the bpe_train architecture):

* the corpus is touched ONCE — a two-phase aggregate builds the
  word-frequency table (|word vocab| rows); every EM iteration runs
  over that table, never the corpus;
* the candidate seed is one explode of all substrings ≤
  ``max_piece_len`` per unique word, weighted by word count — a hash
  aggregate whose output is bounded by construction
  (``seed_size`` + alphabet);
* the E-step Viterbi is a pure ``aggregate`` HOF fold per word (two
  folds: forward DP, then a backpointer walk) — no shuffle, no Python;
  the M-step recount is one explode + hash aggregate, collected to the
  driver (vocab-bounded state, the k-means/bpe sanction);
* piece scores cross into the DP as INTEGER micro-log-units computed
  ONCE driver-side (``round(ln(c/T)·10⁶)``) and injected as literals —
  the ndcg_weights discipline: the distributed sum is an exact bigint
  SUM of shared constants, order-independent, bit-identical in any
  engine (and in the pure-Python reference the tests pin against),
  where a float log-prob sum would be partition-order-dependent.

Determinism contract (pinned EXACTLY in tests/test_unigram.py against
a pure-Python reference): seed ties break (count desc, piece asc);
Viterbi ties keep the FIRST (shortest-last-piece) candidate; prune
keeps every single character (coverage floor — any word stays
segmentable) plus the top multi-char pieces by (count desc, piece asc).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_NEG_INF = -(2**62)


def _word_table(df: DataFrame, text_col: str) -> DataFrame:
    from etl_capnz_spark.operators.text import tokens

    return (
        df.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )


def unigram_seed_counts(
    df: DataFrame,
    text_col: str,
    max_piece_len: int = 4,
    seed_size: int = 200,
) -> list[tuple[str, int]]:
    """Candidate seed: all substrings of length 1..max_piece_len of
    every unique word, weighted by word frequency; kept = every single
    character + the top ``seed_size`` multi-char pieces by
    (count desc, piece asc). Returns a driver list — the seed is
    bounded by construction and IS the EM state."""
    words = _word_table(df, text_col)
    subs = F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.length("word")),
            lambda i: F.filter(
                F.transform(
                    F.sequence(
                        F.lit(1), F.lit(max_piece_len)
                    ),
                    lambda l: F.when(
                        i + l - 1 <= F.length("word"),
                        F.col("word").substr(i, l),
                    ),
                ),
                lambda p: p.isNotNull(),
            ),
        )
    )
    counts = (
        words.select(F.explode(subs).alias("piece"), "n")
        .groupBy("piece")
        .agg(F.sum("n").alias("cnt"))
        .collect()
    )
    chars = sorted(
        (r["piece"], r["cnt"]) for r in counts if len(r["piece"]) == 1
    )
    multi = sorted(
        ((r["piece"], r["cnt"]) for r in counts if len(r["piece"]) > 1),
        key=lambda t: (-t[1], t[0]),
    )[:seed_size]
    return chars + sorted(multi)


def _micro_log_scores(vocab: list[tuple[str, int]]) -> dict[str, int]:
    """Integer micro-log-unit score per piece: round(ln(c/T)·10⁶),
    computed ONCE driver-side so every engine (and the pure-Python
    reference) sums the SAME integers."""
    total = sum(c for _, c in vocab)
    return {
        p: int(round(math.log(c / total) * 1_000_000)) for p, c in vocab
    }


def viterbi_pieces(
    word, scores: dict[str, int], max_piece_len: int
):
    """Best segmentation of ``word`` under integer piece scores, as a
    pure two-fold HOF expression (no shuffle, no Python):

    fold 1 — forward DP over positions 1..len: best[j] = max over
    piece lengths l=1..min(L,j) with word[j-l+1..j] in vocab of
    best[j-l] + score(piece); ties keep the FIRST (smallest l)
    candidate; unreachable = -2⁶².
    fold 2 — backpointer walk from len down to 0, prepending pieces
    (len iterations suffice: a path has ≤ len pieces; exhausted steps
    no-op).

    Single characters are always in the vocab (the prune floor), so
    every position is reachable.
    """
    smap = F.create_map(
        *[
            x
            for p, s in sorted(scores.items())
            for x in (F.lit(p), F.lit(s))
        ]
    )
    word = F.lower(word)

    def fwd_step(acc, j):
        # acc holds structs (c, b) for positions 0..j-1; entry for
        # position p sits at element_at index p+1. Indexes clamp to 1
        # and the map lookup is try_element_at because ANSI mode makes
        # element_at THROW on index 0 / missing key even in a pruned
        # WHEN branch (the l <= j guard below discards the value)
        best = None
        for l in range(1, max_piece_len + 1):
            piece = word.substr(j - F.lit(l) + 1, F.lit(l))
            prev = F.element_at(
                acc, F.greatest(j - F.lit(l) + 1, F.lit(1))
            )
            cand_c = prev["c"] + F.coalesce(
                F.try_element_at(smap, piece), F.lit(_NEG_INF)
            )
            cand = F.when(
                (F.lit(l) <= j) & (prev["c"] > F.lit(_NEG_INF)),
                F.struct(
                    cand_c.alias("c"), (j - F.lit(l)).alias("b")
                ),
            ).otherwise(
                F.struct(
                    F.lit(_NEG_INF).cast("bigint").alias("c"),
                    F.lit(-1).alias("b"),
                )
            )
            if best is None:
                best = cand
            else:
                # strict >: the FIRST (shortest) candidate wins ties
                best = F.when(cand["c"] > best["c"], cand).otherwise(
                    best
                )
        return F.concat(acc, F.array(best))

    dp = F.aggregate(
        F.sequence(F.lit(1), F.length(word)),
        F.array(
            F.struct(
                F.lit(0).cast("bigint").alias("c"),
                F.lit(-1).alias("b"),
            )
        ),
        fwd_step,
    )

    def back_step(acc, _):
        pos = acc["pos"]
        b = F.element_at(dp, pos + 1)["b"]
        piece = word.substr(b + 1, pos - b)
        return F.when(
            pos > 0,
            F.struct(
                b.alias("pos"),
                F.concat(F.array(piece), acc["arr"]).alias("arr"),
            ),
        ).otherwise(acc)

    walked = F.aggregate(
        F.sequence(F.lit(1), F.length(word)),
        F.struct(
            F.length(word).alias("pos"),
            F.array().cast("array<string>").alias("arr"),
        ),
        back_step,
    )
    return walked["arr"]


def unigram_train(
    df: DataFrame,
    text_col: str,
    vocab_size: int = 120,
    max_piece_len: int = 4,
    seed_size: int = 200,
    iters: int = 2,
) -> list[tuple[str, int]]:
    """EM-train a unigram piece vocabulary. Returns the final
    [(piece, count)] sorted by (count desc, piece asc) — driver-bounded
    state throughout (≤ seed_size + alphabet entries), exactly the
    bpe_train contract.

    Hard EM (Viterbi counts, the deterministic variant): E-step
    re-segments the word table under the current integer scores;
    M-step recounts pieces from the segmentations; prune keeps every
    single char (coverage floor, count-1 smoothing if unused) + the
    top ``vocab_size - n_chars`` multi-char pieces."""
    words = _word_table(df, text_col).localCheckpoint()
    vocab = unigram_seed_counts(df, text_col, max_piece_len, seed_size)
    chars = {p for p, _ in vocab if len(p) == 1}
    for _ in range(iters):
        scores = _micro_log_scores(vocab)
        seg = words.select(
            "n",
            F.explode(
                viterbi_pieces(F.col("word"), scores, max_piece_len)
            ).alias("piece"),
        )
        counts = {
            r["piece"]: r["cnt"]
            for r in seg.groupBy("piece")
            .agg(F.sum("n").alias("cnt"))
            .collect()
        }
        kept_chars = sorted(
            (c, max(counts.get(c, 0), 1)) for c in chars
        )
        multi = sorted(
            (
                (p, c)
                for p, c in counts.items()
                if len(p) > 1
            ),
            key=lambda t: (-t[1], t[0]),
        )[: max(vocab_size - len(chars), 0)]
        vocab = kept_chars + sorted(multi)
    return sorted(vocab, key=lambda t: (-t[1], t[0]))


def unigram_vocab_df(spark, vocab: list[tuple[str, int]]) -> DataFrame:
    return spark.createDataFrame(vocab, "piece string, cnt bigint")


def unigram_encode(
    df: DataFrame,
    text_col: str,
    id_col: str,
    vocab: list[tuple[str, int]],
    max_piece_len: int = 4,
) -> DataFrame:
    """Tokenize a corpus with a trained vocabulary: per-word Viterbi
    under the final integer scores, words' pieces concatenated in
    order. One narrow pass; the fold runs JVM-side per row. Output:
    (id, pieces array<string>, n_pieces)."""
    from etl_capnz_spark.operators.text import tokens

    scores = _micro_log_scores(vocab)
    pieces = F.flatten(
        F.transform(
            tokens(F.col(text_col)),
            lambda w: viterbi_pieces(w, scores, max_piece_len),
        )
    )
    return df.select(
        F.col(id_col),
        pieces.alias("pieces"),
    ).withColumn("n_pieces", F.size("pieces"))
