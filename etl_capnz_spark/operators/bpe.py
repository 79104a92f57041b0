"""Distributed BPE tokenizer training (north-star extension, SURVEY.md
§2.12): learn byte-pair-encoding merges from a corpus — the tokenizer-
build step of an LLM data pipeline (Sennrich et al. 2016, "Neural
Machine Translation of Rare Words with Subword Units").

The classic algorithm never touches the corpus after one pass: it
operates on the WORD-FREQUENCY table (|vocab| rows, each a symbol
sequence + count), repeatedly (1) counting weighted adjacent symbol
pairs, (2) picking the most frequent pair, (3) merging that pair
greedily left-to-right in every word. This maps cleanly onto DataFrames:

* the word table is built by ONE two-phase aggregate over the corpus —
  the only stage that sees raw text;
* each merge iteration is an explode → weighted hash-aggregate over the
  |vocab|-row table plus a 1-ROW collect for the argmax (bounded driver
  action, same sanction as the k-means centroid pulls in similarity.py);
* the merge rewrite is a pure ``aggregate`` HOF fold per word — no
  shuffle at all;
* ``localCheckpoint`` after each rewrite keeps the plan from nesting k
  HOF folds (the table is |vocab| rows — tiny relative to the corpus —
  so materializing it per iteration is the right trade at any scale).

Determinism: ties on pair count break by (left, right) lexicographic —
pinned identically in tests' pure-Python reference implementation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

END_OF_WORD = "</w>"


def word_symbol_table(df: DataFrame, text_col: str) -> DataFrame:
    """(word, n, symbols) — frequency-weighted unique words, each split
    into single-character symbols with the end-of-word marker appended."""
    from etl_capnz_spark.operators.text import tokens

    words = (
        df.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )
    chars = F.transform(
        F.sequence(F.lit(1), F.length("word")),
        lambda i: F.col("word").substr(i, F.lit(1)),
    )
    return words.withColumn(
        "symbols", F.concat(chars, F.array(F.lit(END_OF_WORD)))
    )


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """Weighted adjacent-pair counts over the symbol table: explode the
    zip of symbols[0:-1] × symbols[1:], weight by word count."""
    pairs = F.zip_with(
        F.slice(F.col("symbols"), 1, F.size("symbols") - 1),
        F.slice(F.col("symbols"), 2, F.size("symbols") - 1),
        lambda a, b: F.struct(a.alias("left"), b.alias("right")),
    )
    return (
        vocab.filter(F.size("symbols") >= 2)
        .select(F.explode(pairs).alias("p"), "n")
        .groupBy("p.left", "p.right")
        .agg(F.sum("n").alias("cnt"))
    )


def _merge_pair(vocab: DataFrame, left: str, right: str) -> DataFrame:
    """Greedy left-to-right merge of (left, right) in every word — a pure
    fold, no shuffle. A just-merged symbol is never re-used as the LEFT of
    an overlapping match (the fold compares the accumulated tail, which
    already holds the merged token)."""
    merged = left + right
    fold = F.aggregate(
        F.col("symbols"),
        F.array().cast("array<string>"),
        lambda acc, c: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (c == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.lit(merged)),
            ),
        ).otherwise(F.concat(acc, F.array(c))),
    )
    return vocab.withColumn("symbols", fold)


def bpe_train(
    df: DataFrame, text_col: str, num_merges: int = 10
) -> tuple[list[tuple[int, str, str, int]], DataFrame]:
    """Learn ``num_merges`` BPE merges. Returns (merges, final_vocab):
    merges as [(rank, left, right, weighted_count)], vocab as the symbol
    table after all merges (word, n, symbols)."""
    vocab = word_symbol_table(df, text_col)
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(num_merges):
        top = (
            _pair_counts(vocab)
            .orderBy(F.col("cnt").desc(), "left", "right")
            .limit(1)
            .collect()
        )
        if not top:
            break
        row = top[0]
        merges.append((rank, row["left"], row["right"], row["cnt"]))
        vocab = _merge_pair(vocab, row["left"], row["right"]).localCheckpoint()
    return merges, vocab


def bpe_encode(
    df: DataFrame,
    text_col: str,
    merges: list[tuple[int, str, str, int]],
) -> DataFrame:
    """Apply learned merges to tokenize text — the MAP stage that runs
    over the full 100 TB corpus once training is done.

    Each word splits to characters (+ end-of-word) and the merges apply
    in rank order as a chain of shuffle-free folds; the whole encoder is
    ONE narrow column expression, so it composes with scans, pushdown,
    and whatever else the pipeline does — no UDF, no shuffle, no state.
    Returns the input plus ``bpe_tokens array<string>`` and
    ``n_bpe_subwords int`` columns.
    """
    from etl_capnz_spark.operators.text import tokens

    def encode_word(word):
        sym = F.concat(
            F.transform(
                F.sequence(F.lit(1), F.length(word)),
                lambda i: word.substr(i, F.lit(1)),
            ),
            F.array(F.lit(END_OF_WORD)),
        )
        def fold_step(left, right):
            merged = left + right

            def step(acc, c):
                return F.when(
                    (F.size(acc) > 0)
                    & (F.element_at(acc, -1) == F.lit(left))
                    & (c == F.lit(right)),
                    F.concat(
                        F.slice(acc, 1, F.size(acc) - 1),
                        F.array(F.lit(merged)),
                    ),
                ).otherwise(F.concat(acc, F.array(c)))

            return step

        for _, left, right, _ in merges:
            sym = F.aggregate(
                sym,
                F.array().cast("array<string>"),
                fold_step(left, right),
            )
        return sym

    toks = F.flatten(
        F.transform(tokens(F.col(text_col)), encode_word)
    )
    return df.withColumn("bpe_tokens", toks).withColumn(
        "n_bpe_subwords", F.size("bpe_tokens")
    )


def bpe_merges_df(
    df: DataFrame, text_col: str, num_merges: int = 10
) -> DataFrame:
    """The learned merge table as a DataFrame (rank, left, right, cnt) —
    the artifact a tokenizer ships."""
    spark = df.sparkSession
    merges, _ = bpe_train(df, text_col, num_merges)
    return spark.createDataFrame(
        merges, "rank int, left string, right string, cnt bigint"
    )
