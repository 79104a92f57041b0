"""Invariants of C4-style global chunk-span dedup
(operators/dedup.py chunk_span_dedup) on constructed corpora, plus a
hypothesis sweep: whatever the corpus, the output must be a subset of
each doc's original chunks in original order, every surviving chunk must
be globally unique, and re-running on the cleaned corpus must be a
no-op (idempotence)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from etl_capnz_spark.operators.dedup import chunk_span_dedup


def _chunks(text: str, n: int) -> list[str]:
    toks = text.split(" ")
    return [
        " ".join(toks[i : i + n]) for i in range(0, len(toks), n)
    ]


def _run(spark, rows, n=3):
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = chunk_span_dedup(df, "text", "doc_id", chunk_tokens=n)
    return {r["doc_id"]: r for r in out.collect()}


def test_unique_corpus_is_untouched(spark):
    rows = [(1, "a b c d e f g"), (2, "h i j k l m")]
    got = _run(spark, rows)
    assert got[1]["clean_text"] == "a b c d e f g"
    assert got[2]["clean_text"] == "h i j k l m"
    assert all(r["n_kept"] == r["n_total"] for r in got.values())


def test_full_duplicate_doc_disappears(spark):
    rows = [(1, "a b c d e f"), (2, "a b c d e f")]
    got = _run(spark, rows)
    assert 1 in got and 2 not in got
    assert got[1]["n_kept"] == 2


def test_partial_overlap_keeps_first_occurrence_only(spark):
    # doc 2 shares its first chunk with doc 1; its tail chunk survives
    rows = [(1, "a b c x y z"), (2, "a b c q r s")]
    got = _run(spark, rows)
    assert got[1]["clean_text"] == "a b c x y z"
    assert got[2]["clean_text"] == "q r s"
    assert got[2]["n_kept"] == 1 and got[2]["n_total"] == 2


def test_within_doc_repeat_collapses(spark):
    rows = [(7, "a b c a b c a b c")]
    got = _run(spark, rows)
    assert got[7]["clean_text"] == "a b c"
    assert got[7]["n_kept"] == 1 and got[7]["n_total"] == 3


def test_hypothesis_invariants_and_idempotence(spark):
    words = st.sampled_from(["a", "b", "c", "d"])
    doc = st.lists(words, min_size=1, max_size=12).map(" ".join)

    @settings(max_examples=8, deadline=None)
    @given(st.lists(doc, min_size=1, max_size=5))
    def check(texts):
        rows = [(i, t) for i, t in enumerate(texts)]
        got = _run(spark, rows, n=3)
        seen: set[str] = set()
        for i, t in rows:
            orig = [c for c in _chunks(t, 3) if c]
            if i not in got:
                # every chunk must have been claimed earlier
                continue
            kept = [c for c in _chunks(got[i]["clean_text"], 3) if c]
            # order-preserving subsequence of the original chunk list
            it = iter(orig)
            assert all(any(c == o for o in it) for c in kept)
            for c in kept:
                assert c not in seen  # global uniqueness
                seen.add(c)
        # idempotence: re-running on the cleaned corpus changes nothing
        cleaned = [(i, got[i]["clean_text"]) for i, _ in rows if i in got]
        again = _run(spark, cleaned, n=3)
        for i, t in cleaned:
            assert again[i]["clean_text"] == t

    check()


def test_cdc_chunks_edit_robustness_and_coverage(spark):
    """The CDC property itself: chunks tile the document exactly
    (coverage), and after inserting text near the FRONT of a document
    the chunk-hash multiset of the tail is preserved (boundaries are
    content-defined) while fixed-width chunking at the same grain
    would shift every downstream chunk. Short docs are one chunk."""
    from etl_capnz_spark.operators.text import cdc_chunks

    base = (
        "the quick brown fox jumps over the lazy dog again and again "
        "while the rolling hash marks content defined boundaries that "
        "survive local edits to earlier regions of the document body"
    ) * 3
    edited = "INSERTED PREFIX CHANGES EARLY CONTENT " + base
    df = spark.createDataFrame(
        [(1, base), (2, edited), (3, "tiny")], "doc_id long, text string"
    )
    rows = cdc_chunks(df, "text", "doc_id").collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # coverage: chunks tile [1, len] contiguously in idx order
    for doc_id, text in [(1, base), (2, edited), (3, "tiny")]:
        chs = sorted(by_doc[doc_id], key=lambda r: r["chunk_idx"])
        pos = 1
        for c in chs:
            assert c["start"] == pos
            pos += c["length"]
        assert pos == len(text) + 1
    assert len(by_doc[3]) == 1  # shorter than the window: one chunk
    # edit robustness: most of doc 1's chunk hashes survive in doc 2
    h1 = [c["chunk_hash"] for c in by_doc[1]]
    h2 = set(c["chunk_hash"] for c in by_doc[2])
    assert len(h1) >= 4
    surviving = sum(1 for h in h1 if h in h2)
    assert surviving >= len(h1) - 2  # only the edited region differs
