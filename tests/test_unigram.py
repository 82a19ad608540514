"""Unigram tokenizer: the trained inventory and encode output are
hash-checked against an INDEPENDENTLY WRITTEN pure-Python reference
(Counter-based seeding, recursive-memoized Viterbi — different code
shape, same documented spec), plus lossless round-trip and OOV
behavior."""

from __future__ import annotations

import math
from collections import Counter
from functools import lru_cache

import pytest

from pyspark_airflow_weather_etl_spark.operators.unigram import (
    unigram_encode,
    unigram_load_vocab,
    unigram_save_vocab,
    unigram_train,
)
from pyspark_airflow_weather_etl_spark.sources.tables import load_table

from conftest import SF_DIR

L, MIN_FREQ, MAX_SEED, VOCAB, ITERS = 4, 2, 200, 120, 3


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF_DIR, "documents").cache()


@pytest.fixture(scope="module")
def texts(docs):
    return [r.text for r in docs.select("text").collect()]


def _ref_train(texts):
    """Independent reference: same spec as operators.unigram (module
    docstring there), implemented with Counter + recursive Viterbi."""
    wf = Counter()
    for t in texts:
        for w in t.split():
            if w:
                wf[w] += 1
    # seed: substrings ≤ L, cap by (-freq, piece), union chars
    subs = Counter()
    for w, f in wf.items():
        for i in range(len(w)):
            for l in range(1, min(L, len(w) - i) + 1):
                subs[w[i : i + l]] += f
    eligible = sorted(
        ((p, c) for p, c in subs.items() if c >= MIN_FREQ),
        key=lambda kv: (-kv[1], kv[0]),
    )
    counts = dict(eligible[:MAX_SEED])
    for p, c in subs.items():
        if len(p) == 1:
            counts[p] = c
    for _ in range(ITERS):
        total, v = sum(counts.values()), len(counts)
        logp = {
            p: math.log((c + 1.0) / (total + v)) for p, c in counts.items()
        }

        @lru_cache(maxsize=None)
        def seg(word):
            # recursive Viterbi, tie → larger final-piece length
            if not word:
                return (0.0, ())
            best = None
            for l in range(1, min(L, len(word)) + 1):
                piece = word[len(word) - l :]
                lp = logp.get(piece)
                if lp is None:
                    continue
                sub = seg(word[: len(word) - l])
                if sub is None:
                    continue
                cand = (sub[0] + lp, sub[1] + (piece,))
                if best is None or cand[0] > best[0] or (
                    cand[0] == best[0] and l > len(best[1][-1])
                ):
                    best = cand
            return best

        new = Counter()
        for w, f in wf.items():
            s = seg(w)
            if s is not None:
                for p in s[1]:
                    new[p] += f
        seg.cache_clear()
        nxt = dict(new)
        for p in counts:
            if len(p) == 1 and p not in nxt:
                nxt[p] = 0
        counts = nxt
    kept = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    final = dict(kept[:VOCAB])
    for p, c in counts.items():
        if len(p) == 1:
            final[p] = c
    return final


@pytest.fixture(scope="module")
def ref_vocab(texts):
    return _ref_train(texts)


@pytest.fixture(scope="module")
def engine_vocab(docs):
    return unigram_train(
        docs,
        max_piece_len=L,
        min_freq=MIN_FREQ,
        max_seed=MAX_SEED,
        vocab_size=VOCAB,
        em_iters=ITERS,
    )


def test_trained_vocab_matches_reference(engine_vocab, ref_vocab):
    assert engine_vocab == ref_vocab


def test_encode_matches_reference_and_roundtrips(
    spark, docs, engine_vocab, ref_vocab
):
    total, v = sum(ref_vocab.values()), len(ref_vocab)
    logp = {
        p: math.log((c + 1.0) / (total + v)) for p, c in ref_vocab.items()
    }

    def ref_seg(word):
        n = len(word)
        best = [-math.inf] * (n + 1)
        back = [0] * (n + 1)
        best[0] = 0.0
        for i in range(1, n + 1):
            for l in range(1, min(L, i) + 1):
                lp = logp.get(word[i - l : i])
                if lp is None or best[i - l] == -math.inf:
                    continue
                cand = best[i - l] + lp
                if cand > best[i] or (cand == best[i] and l > back[i]):
                    best[i], back[i] = cand, l
        out, i = [], n
        while i > 0:
            out.append(word[i - back[i] : i])
            i -= back[i]
        return list(reversed(out))

    got = {
        r.doc_id: r
        for r in unigram_encode(
            docs, engine_vocab, max_piece_len=L
        ).collect()
    }
    texts = {r.doc_id: r.text for r in docs.select("doc_id", "text").collect()}
    assert set(got) == set(texts)
    for did, text in texts.items():
        words = [w for w in text.split() if w]
        want = []
        for w in words:
            want.extend(ref_seg(w))
        r = got[did]
        assert r.pieces.split() == want, did
        assert r.n_oov_words == 0
        # lossless: concatenating a word's pieces restores the word
        assert "".join(want) == "".join(words)


def test_oov_word_counted_and_skipped(spark, engine_vocab):
    df = spark.createDataFrame(
        [(1, "scan éé scan")], "doc_id long, text string"
    )
    r = unigram_encode(df, engine_vocab, max_piece_len=L).first()
    assert (r.n_words, r.n_oov_words) == (3, 1)
    assert "é" not in r.pieces
    assert r.pieces.split().count("scan") >= 1


def test_vocab_artifact_roundtrip(spark, engine_vocab, tmp_path):
    path = str(tmp_path / "unigram_vocab")
    unigram_save_vocab(spark, engine_vocab, path)
    assert unigram_load_vocab(spark, path) == engine_vocab
