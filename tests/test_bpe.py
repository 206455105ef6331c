"""BPE tokenizer (operators/bpe.py): training determinism, lossless
roundtrip, distributed-encode parity with the driver-side loop."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from squrve_spark.operators import bpe

_WF = {
    "low": 5, "lower": 2, "newest": 6, "widest": 3, "the": 10, "they": 4,
    "these": 2, "lowest": 1,
}


def test_training_learns_frequent_pairs_and_is_deterministic():
    m1 = bpe.train_bpe_merges(_WF, 30)
    m2 = bpe.train_bpe_merges(_WF, 30)
    assert m1 == m2
    assert ("t", "h") in m1  # 'th' dominates the table
    # merges stop when nothing repeats (no memorization of singletons)
    assert len(m1) <= 30


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.text(alphabet="abcdef ghij", min_size=0, max_size=12),
        min_size=0, max_size=8,
    )
)
def test_roundtrip_lossless(words):
    text = " ".join(w for w in " ".join(words).split())  # normalized spacing
    ranks = {p: i for i, p in enumerate(bpe.train_bpe_merges(_WF, 30))}
    toks = []
    for w in text.split():
        toks.extend(bpe.encode_word(w, ranks))
    assert bpe.decode_tokens(toks) == text


def test_distributed_encode_matches_driver(spark):
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .filter("doc_id < 40")
        .select("doc_id", "text")
    )
    merges = bpe.train_bpe(docs, n_merges=60)
    assert merges == bpe.train_bpe(docs, n_merges=60)  # deterministic
    ranks = {p: i for i, p in enumerate(merges)}
    got = {
        r["doc_id"]: (list(r["tokens"]), r["n_bpe_tokens"])
        for r in bpe.encode_documents(docs, merges).collect()
    }
    for row in docs.collect():
        toks = []
        for w in row["text"].split():
            toks.extend(bpe.encode_word(w, ranks))
        assert got[row["doc_id"]] == (toks, len(toks)), row["doc_id"]
        assert bpe.decode_tokens(toks) == " ".join(row["text"].split())


def test_compression_vs_chars(spark):
    """Merges must actually compress: BPE token count strictly below
    character count and at least the word count."""
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .filter("doc_id < 40")
        .select("doc_id", "text")
    )
    merges = bpe.train_bpe(docs, n_merges=120)
    enc = {r["doc_id"]: r["n_bpe_tokens"] for r in bpe.encode_documents(docs, merges).collect()}
    for row in docs.collect():
        n_words = len(row["text"].split())
        assert n_words <= enc[row["doc_id"]] < len(row["text"])
