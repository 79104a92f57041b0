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


def _ref_encode(texts, merges):
    out = []
    for t in texts:
        toks = []
        for w in t.lower().strip().split():
            if not w:
                continue
            s = list(w) + [END_OF_WORD]
            for _, a, b, _c in merges:
                new = []
                for c in s:
                    if new and new[-1] == a and c == b:
                        new[-1] = a + b
                    else:
                        new.append(c)
                s = new
            toks.extend(s)
        out.append(toks)
    return out


def test_bpe_encode_matches_reference(spark, sf_dir):
    from etl_capnz_spark.operators.bpe import bpe_encode

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").orderBy(
        "doc_id"
    )
    rows = docs.select("doc_id", "text").collect()
    texts = [r["text"] for r in rows]
    merges, _ = _ref_bpe(texts, 6)
    got = {
        r["doc_id"]: list(r["bpe_tokens"])
        for r in bpe_encode(docs, "text", merges).collect()
    }
    want = dict(zip((r["doc_id"] for r in rows), _ref_encode(texts, merges)))
    assert got == want


def test_bpe_fold_preserves_concatenation(spark):
    """Invariant: merging never loses or reorders characters — after any
    merge sequence, concatenating a word's symbols reproduces
    word + END_OF_WORD. Checked over every vocab word after training."""
    texts = [
        "aaa aab abab baba abba low lower lowest newest lowlow",
        "banana bandana ana nab aaa abab",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    _, vocab = bpe_train(df, "text", num_merges=10)
    for r in vocab.collect():
        assert "".join(r["symbols"]) == r["word"] + END_OF_WORD, r["word"]
