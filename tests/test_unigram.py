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


class TestFullEm:
    """Full-EM trainer: engine == independent reference (spec-pinned
    float order + integer micro-count aggregation makes this an EXACT
    equality), posterior mass conservation, and hard-vs-soft
    difference is real."""

    def _ref_em(self, texts):
        from pyspark_airflow_weather_etl_spark.operators.unigram import (
            EM_SCALE,
        )

        wf = Counter()
        for t in texts:
            for w in t.split():
                if w:
                    wf[w] += 1
        subs = Counter()
        for w, f in wf.items():
            for i in range(len(w)):
                for l in range(1, min(L, len(w) - i) + 1):
                    subs[w[i : i + l]] += f
        eligible = sorted(
            ((p, c) for p, c in subs.items() if c >= MIN_FREQ),
            key=lambda kv: (-kv[1], kv[0]),
        )
        scaled = {p: c * EM_SCALE for p, c in dict(eligible[:MAX_SEED]).items()}
        for p, c in subs.items():
            if len(p) == 1:
                scaled[p] = c * EM_SCALE
        for _ in range(ITERS):
            total, v = sum(scaled.values()), len(scaled)
            probs = {
                p: (c + EM_SCALE) / (total + v * EM_SCALE)
                for p, c in scaled.items()
            }
            agg = {}
            for w, f in wf.items():
                n = len(w)
                alpha = [0.0] * (n + 1)
                alpha[0] = 1.0
                for i in range(1, n + 1):
                    for l in range(1, min(L, i) + 1):
                        p = probs.get(w[i - l : i])
                        if p is not None and alpha[i - l] > 0.0:
                            alpha[i] += alpha[i - l] * p
                z = alpha[n]
                if z == 0.0:
                    continue
                beta = [0.0] * (n + 1)
                beta[n] = 1.0
                for i in range(n - 1, -1, -1):
                    for l in range(1, min(L, n - i) + 1):
                        p = probs.get(w[i : i + l])
                        if p is not None and beta[i + l] > 0.0:
                            beta[i] += p * beta[i + l]
                per_word = {}
                for i in range(1, n + 1):
                    for l in range(1, min(L, i) + 1):
                        piece = w[i - l : i]
                        p = probs.get(piece)
                        if p is not None and alpha[i - l] > 0.0 and beta[i] > 0.0:
                            per_word[piece] = (
                                per_word.get(piece, 0.0)
                                + alpha[i - l] * p * beta[i] / z
                            )
                for piece, c in per_word.items():
                    agg[piece] = agg.get(piece, 0) + f * int(
                        round(c * EM_SCALE)
                    )
            for p in scaled:
                if len(p) == 1 and p not in agg:
                    agg[p] = 0
            scaled = agg
        kept = sorted(scaled.items(), key=lambda kv: (-kv[1], kv[0]))
        final = dict(kept[:VOCAB])
        for p, c in scaled.items():
            if len(p) == 1:
                final[p] = c
        return final

    def test_em_matches_reference(self, spark, docs, texts):
        from pyspark_airflow_weather_etl_spark.operators.unigram import (
            unigram_train_em,
        )

        got = unigram_train_em(
            docs,
            max_piece_len=L,
            min_freq=MIN_FREQ,
            max_seed=MAX_SEED,
            vocab_size=VOCAB,
            em_iters=ITERS,
        )
        want = self._ref_em(texts)
        assert got == want

    def test_posterior_mass_conserved(self):
        """For any word, expected piece counts weighted by piece
        length must sum to the word length (every character is covered
        by exactly one piece in every segmentation)."""
        from pyspark_airflow_weather_etl_spark.operators.unigram import (
            _expected_piece_counts,
        )

        probs = {"a": 0.3, "b": 0.2, "ab": 0.1, "ba": 0.05, "abb": 0.02}
        for word in ["abba", "ab", "bab", "aaaa"]:
            got = _expected_piece_counts(word, probs, 3)
            assert got is not None
            mass = sum(len(p) * c for p, c in got)
            assert abs(mass - len(word)) < 1e-9, (word, mass)

    def test_soft_differs_from_hard(self, spark, docs, engine_vocab):
        """The expected-count table must differ from the Viterbi-count
        table (if they were equal the full-EM path wouldn't be
        exercising anything)."""
        from pyspark_airflow_weather_etl_spark.operators.unigram import (
            EM_SCALE,
            unigram_train_em,
        )

        em = unigram_train_em(
            docs,
            max_piece_len=L,
            min_freq=MIN_FREQ,
            max_seed=MAX_SEED,
            vocab_size=VOCAB,
            em_iters=ITERS,
        )
        hard_scaled = {p: c * EM_SCALE for p, c in engine_vocab.items()}
        assert em != hard_scaled


def test_driver_mode_equals_distributed(spark, docs):
    """mode='driver' (every EM round in plain Python over the
    collected vocab — zero jobs per round, the BPE round-14 playbook)
    learns IDENTICAL tables to the distributed trainers for all three
    families: hard-EM/Viterbi, full EM, and the frozen-vocab
    fixed-counts twin. Integer count sums are orderless, so equality
    is exact, not approximate."""
    import pyspark_airflow_weather_etl_spark.operators.unigram as U

    kw = dict(max_piece_len=4, min_freq=2, max_seed=120, em_iters=2)
    drv = U.unigram_train(docs, vocab_size=80, mode="driver", **kw)
    dist = U.unigram_train(docs, vocab_size=80, mode="distributed", **kw)
    assert drv == dist
    drv = U.unigram_train_em(docs, vocab_size=80, mode="driver", **kw)
    dist = U.unigram_train_em(docs, vocab_size=80, mode="distributed", **kw)
    assert drv == dist
    a = sorted(map(tuple, U.unigram_em_fixed_counts(
        docs, mode="driver", **kw).collect()))
    b = sorted(map(tuple, U.unigram_em_fixed_counts(
        docs, mode="distributed", **kw).collect()))
    assert a == b
    # 'auto' routes this fixture's small vocab to driver, results same
    auto = U.unigram_train(docs, vocab_size=80, mode="auto", **kw)
    assert auto == dist or auto == U.unigram_train(
        docs, vocab_size=80, mode="driver", **kw
    )
    import pytest

    with pytest.raises(ValueError):
        U.unigram_train(docs, mode="nope")
