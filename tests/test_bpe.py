"""BPE training (operators/bpe.py): the distributed merge learner must
produce EXACTLY the merge sequence of the classic single-machine
algorithm (Sennrich et al. 2016), including tie-breaks."""

from collections import Counter

from etl_capnz_spark.operators.bpe import END_OF_WORD, bpe_train


def _ref_bpe(texts, k):
    """Pure-Python reference: word-frequency BPE with greedy left-to-
    right merges and (count desc, pair asc) tie-breaks."""
    words = Counter()
    for t in texts:
        for w in t.lower().strip().split():
            if w:
                words[w] += 1
    vocab = {w: list(w) + [END_OF_WORD] for w in words}
    merges = []
    for rank in range(k):
        pc = Counter()
        for w, n in words.items():
            s = vocab[w]
            for a, b in zip(s, s[1:]):
                pc[(a, b)] += n
        if not pc:
            break
        (a, b), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, a, b, cnt))
        for w, s in vocab.items():
            out = []
            for c in s:
                if out and out[-1] == a and c == b:
                    out[-1] = a + b
                else:
                    out.append(c)
            vocab[w] = out
    return merges, vocab


def test_bpe_matches_reference_on_tiny_corpus(spark):
    texts = [
        "low low low lower lower newest newest newest newest widest",
        "widest widest newest low",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got, _ = bpe_train(df, "text", num_merges=6)
    want, _ = _ref_bpe(texts, 6)
    assert got == want


def test_bpe_matches_reference_on_documents(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    texts = [r["text"] for r in docs.select("text").collect()]
    got, vocab = bpe_train(docs, "text", num_merges=8)
    want, ref_vocab = _ref_bpe(texts, 8)
    assert got == want
    # final symbol tables agree too (spot the whole table, not just merges)
    got_tab = {
        r["word"]: list(r["symbols"]) for r in vocab.collect()
    }
    assert got_tab == ref_vocab
