"""Distributed BPE training vs a pure-Python reference implementation
(Sennrich et al. greedy BPE with the same deterministic tie-break)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from optiprism_spark.operators.bpe import (
    EOW,
    bpe_token_counts,
    bpe_train,
    word_counts,
)


def ref_bpe(wc: dict, n_merges: int):
    """Reference trainer on a word->count dict; tie-break
    (count desc, a asc, b asc) mirrors the operator's orderBy."""
    vocab = {w: [*list(w), EOW] for w in wc}
    merges = []
    for _ in range(n_merges):
        pairs: dict = {}
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pairs[p] = pairs.get(p, 0) + wc[w]
        if not pairs:
            break
        (a, b), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        if cnt < 2:
            break
        merges.append((a, b))
        new: dict = {}
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new[w] = out
        vocab = new
    return merges, vocab


@pytest.fixture(autouse=True)
def _free_tracked_persists():
    """bpe_train track_persists its vocab frames; free them so cached
    relations don't leak into later plan-assertion sessions."""
    yield
    from optiprism_spark.operators._util import unpersist_tracked

    unpersist_tracked()


WC = {"low": 5, "lower": 2, "newest": 6, "widest": 3}


def _docs(spark):
    # one row per word occurrence keeps frequencies exact
    rows, i = [], 0
    for w, c in WC.items():
        for _ in range(c):
            rows.append((i, w))
            i += 1
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_word_counts(spark):
    got = {r.word: r.n for r in word_counts(_docs(spark)).collect()}
    assert got == WC


def test_bpe_train_matches_reference(spark):
    want_merges, want_vocab = ref_bpe(WC, 10)
    merges, seg = bpe_train(_docs(spark), n_merges=10, checkpoint_every=4)
    assert merges == want_merges
    got = {r.word: list(r.syms) for r in seg.collect()}
    # reference vocab keys are reconstructed words; compare per word
    for w in WC:
        assert got[w] == want_vocab[w], (w, got[w], want_vocab[w])


def test_bpe_train_early_stop(spark):
    # all-unique characters: no pair ever reaches count 2 with these
    # single-occurrence words -> training stops before n_merges
    docs = spark.createDataFrame([(0, "abc xyz")], "doc_id long, text string")
    merges, _ = bpe_train(docs, n_merges=10)
    assert merges == []


def test_bpe_token_counts_with_fallback(spark):
    merges, seg = bpe_train(_docs(spark), n_merges=10)
    docs = spark.createDataFrame(
        [(1, "low lower"), (2, "unseen")], "doc_id long, text string")
    got = {r.doc_id: r.n_bpe_tokens
           for r in bpe_token_counts(docs, seg).collect()}
    _, vocab = ref_bpe(WC, 10)
    assert got[1] == len(vocab["low"]) + len(vocab["lower"])
    assert got[2] == len("unseen") + 1  # char-split fallback


def test_bpe_merge_handles_backslash_and_quote_symbols(spark):
    """Symbols containing SQL-special characters (backslash, single
    quote) must survive the literal-escaped merge expression — a
    backslash pair previously emitted an unterminated SQL string."""
    docs = spark.createDataFrame(
        [(i, "a\\b a\\b don't don't") for i in range(3)],
        "doc_id long, text string")
    merges, seg = bpe_train(docs, n_merges=6)
    want_merges, want_vocab = ref_bpe(
        {"a\\b": 6, "don't": 6}, 6)
    assert merges == want_merges
    got = {r.word: list(r.syms) for r in seg.collect()}
    for w in ("a\\b", "don't"):
        assert got[w] == want_vocab[w], (w, got[w], want_vocab[w])


def test_batched_merges_match_one_per_round(spark):
    """r17: the top-K batch prefix must reproduce the strict
    sequential loop exactly — same merges, same order, same vocab —
    on corpora engineered to stress the batch-stop conditions
    (symbol overlap between top pairs, chainable repeats, ties)."""
    corpora = [
        {"low": 5, "lower": 2, "newest": 6, "widest": 3},
        {"aaaa": 7, "aaab": 4, "abab": 5},            # chainable repeats
        {"xy": 3, "yx": 3, "xx": 3, "yy": 3},         # tie storm
        {"abc": 4, "abd": 4, "acd": 4, "bcd": 4},     # shared symbols
        {"ab": 2, "ba": 2},                           # minimal counts
    ]
    for wc in corpora:
        rows, i = [], 0
        for w, c in wc.items():
            for _ in range(c):
                rows.append((i, w))
                i += 1
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        m_seq, seg_seq = bpe_train(docs, n_merges=12, batch_k=1)
        v_seq = {r.word: list(r.syms) for r in seg_seq.collect()}
        m_bat, seg_bat = bpe_train(docs, n_merges=12, batch_k=32)
        v_bat = {r.word: list(r.syms) for r in seg_bat.collect()}
        assert m_bat == m_seq, (wc, m_bat, m_seq)
        assert v_bat == v_seq, wc
        want_merges, _ = ref_bpe(wc, 12)
        assert m_bat == want_merges, (wc, m_bat, want_merges)


def test_batched_merges_apply_more_than_one_per_collect(spark):
    """The batching must actually fire on a steep count distribution
    (otherwise the round-trip saving is imaginary)."""
    from optiprism_spark.operators.bpe import _batchable_prefix

    topk = [
        {"p": {"a": "a", "b": "b"}, "cnt": 100},
        {"p": {"a": "a", "b": "z"}, "cnt": 90},   # (a, y!=b): count exact
        {"p": {"a": "e", "b": "f"}, "cnt": 80},
        {"p": {"a": "x", "b": "a"}, "cnt": 70},   # (x, a): decreased -> stop
        {"p": {"a": "g", "b": "h"}, "cnt": 60},
    ]
    batch = _batchable_prefix(topk, remaining=12, truncated=False)
    assert batch == [("a", "b"), ("a", "z"), ("e", "f")]
