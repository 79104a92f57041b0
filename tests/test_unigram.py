"""Unigram-LM tokenizer trainer (VERDICT r8 #8): EXACT pin of the
distributed trainer/encoder against a pure-Python reference that
replicates every documented determinism contract — the bpe_merges
standard. The integer micro-log-unit scores are computed ONCE
driver-side and shared, so the DP sums the same integers on both
sides; any divergence is a real semantics drift, not float noise."""

import math

from pyspark.sql import functions as F

from etl_capnz_spark.operators.unigram import (
    unigram_encode,
    unigram_seed_counts,
    unigram_train,
)

NEG_INF = -(2**62)


# --- pure-Python reference ---------------------------------------------------


def ref_words(texts):
    words = {}
    for t in texts:
        for w in t.lower().split():
            if w:
                words[w] = words.get(w, 0) + 1
    return words


def ref_seed(texts, max_piece_len, seed_size):
    words = ref_words(texts)
    counts = {}
    for w, n in words.items():
        for i in range(len(w)):
            for l in range(1, max_piece_len + 1):
                if i + l <= len(w):
                    p = w[i : i + l]
                    counts[p] = counts.get(p, 0) + n
    chars = sorted((p, c) for p, c in counts.items() if len(p) == 1)
    multi = sorted(
        ((p, c) for p, c in counts.items() if len(p) > 1),
        key=lambda t: (-t[1], t[0]),
    )[:seed_size]
    return chars + sorted(multi)


def ref_scores(vocab):
    total = sum(c for _, c in vocab)
    return {
        p: int(round(math.log(c / total) * 1_000_000)) for p, c in vocab
    }


def ref_viterbi(word, scores, max_piece_len):
    word = word.lower()
    n = len(word)
    best = [(0, -1)] + [(NEG_INF, -1)] * n
    for j in range(1, n + 1):
        for l in range(1, max_piece_len + 1):
            if l > j or best[j - l][0] <= NEG_INF:
                continue
            s = scores.get(word[j - l : j])
            if s is None:
                continue
            c = best[j - l][0] + s
            if c > best[j][0]:  # strict: first (shortest) wins ties
                best[j] = (c, j - l)
    pieces = []
    pos = n
    while pos > 0:
        b = best[pos][1]
        pieces.insert(0, word[b:pos])
        pos = b
    return pieces


def ref_train(texts, vocab_size, max_piece_len, seed_size, iters):
    words = ref_words(texts)
    vocab = ref_seed(texts, max_piece_len, seed_size)
    chars = {p for p, _ in vocab if len(p) == 1}
    for _ in range(iters):
        scores = ref_scores(vocab)
        counts = {}
        for w, n in words.items():
            for p in ref_viterbi(w, scores, max_piece_len):
                counts[p] = counts.get(p, 0) + n
        kept_chars = sorted((c, max(counts.get(c, 0), 1)) for c in chars)
        multi = sorted(
            ((p, c) for p, c in counts.items() if len(p) > 1),
            key=lambda t: (-t[1], t[0]),
        )[: max(vocab_size - len(chars), 0)]
        vocab = kept_chars + sorted(multi)
    return sorted(vocab, key=lambda t: (-t[1], t[0]))


TEXTS = [
    "the weather warning covers the northern region",
    "warning the river is rising near the northern road",
    "road closures in the region as the weather worsens",
    "the warning remains current for northern settlements",
]


def test_seed_counts_exact(spark):
    df = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    got = unigram_seed_counts(df, "text", max_piece_len=3, seed_size=40)
    assert got == ref_seed(TEXTS, 3, 40)


def test_train_exact(spark):
    df = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    got = unigram_train(
        df, "text", vocab_size=30, max_piece_len=3, seed_size=40, iters=2
    )
    expected = ref_train(TEXTS, 30, 3, 40, 2)
    assert got == expected
    # EM actually moved mass onto multi-char pieces
    assert any(len(p) > 1 for p, _ in got)


def test_encode_exact_and_lossless(spark):
    df = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    vocab = unigram_train(
        df, "text", vocab_size=30, max_piece_len=3, seed_size=40, iters=2
    )
    scores = ref_scores(vocab)
    enc = unigram_encode(
        df.select(
            F.monotonically_increasing_id().alias("id"), "text"
        ),
        "text",
        "id",
        vocab,
        max_piece_len=3,
    ).collect()
    by_text = {
        tuple(r["pieces"]): r["n_pieces"] for r in enc
    }
    for t in TEXTS:
        expected = [
            p
            for w in t.lower().split()
            for p in ref_viterbi(w, scores, 3)
        ]
        assert tuple(expected) in by_text
        # losslessness: pieces re-concatenate to the words
        assert "".join(expected) == t.lower().replace(" ", "")


def test_single_char_floor_keeps_rare_words_segmentable(spark):
    # a word whose characters never appear in any multi-char piece must
    # still encode (the coverage floor)
    df = spark.createDataFrame(
        [("aaa aaa aaa bbb",), ("aaa aaa xyzq",)], "text string"
    )
    vocab = unigram_train(
        df, "text", vocab_size=6, max_piece_len=3, seed_size=10, iters=2
    )
    pieces_set = {p for p, _ in vocab}
    assert {"x", "y", "z", "q"} <= pieces_set
    enc = unigram_encode(
        df.select(F.lit(1).alias("id"), "text").limit(1),
        "text",
        "id",
        vocab,
        max_piece_len=3,
    ).collect()
    assert enc[0]["n_pieces"] > 0
