"""BPE trainer/encoder vs a pure-Python reference implementation of
the same semantics (Sennrich et al. 2016 without end-of-word marker:
whitespace pre-tokenization, character alphabet, greedy leftmost
non-overlapping merge application, argmax tiebreak (freq DESC, left,
right), min_freq stop). The catalog entries are rows-only for the
driver — an iterative argmax loop is not one SQL query — so THIS file
is the correctness evidence for the loop: exact merge-sequence and
piece-level equality on the fixture corpus, plus the lossless
round-trip property."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from pyspark_airflow_weather_etl_spark.operators.bpe import (
    bpe_encode,
    bpe_pair_counts,
    bpe_train,
)
from pyspark_airflow_weather_etl_spark.sources.tables import load_table

from conftest import SF_DIR


# --- pure-Python reference -------------------------------------------------

def ref_word_freqs(texts: list[str]) -> Counter:
    c: Counter = Counter()
    for t in texts:
        for w in t.split():
            c[w] += 1
    return c


def ref_train(
    texts: list[str], num_merges: int, min_freq: int = 2
) -> list[tuple[str, str, int]]:
    vocab = {w: tuple(w) for w in ref_word_freqs(texts)}
    freqs = ref_word_freqs(texts)
    merges: list[tuple[str, str, int]] = []
    for _ in range(num_merges):
        pc: Counter = Counter()
        for w, syms in vocab.items():
            f = freqs[w]
            for pair in zip(syms, syms[1:]):
                pc[pair] += f
        best = None
        for pair, n in pc.items():
            if n < min_freq:
                continue
            key = (-n, pair[0], pair[1])
            if best is None or key < best[0]:
                best = (key, pair, n)
        if best is None:
            break
        (_, (l, r), n) = best
        merges.append((l, r, n))
        new_vocab = {}
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[w] = tuple(out)
        vocab = new_vocab
    return merges


def ref_encode_word(
    word: str, merges: list[tuple[str, str, int]]
) -> list[str]:
    # sequential exhaustive application in rank order — deliberately
    # the OTHER algorithm than the UDF's min-rank loop, so equality
    # also cross-checks the two formulations' equivalence
    syms = list(word)
    for l, r, _n in merges:
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                out.append(l + r)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


# --- tests -----------------------------------------------------------------

def _texts(spark, n=300):
    return [
        r.text
        for r in load_table(spark, SF_DIR, "documents")
        .limit(n)
        .select("text")
        .collect()
    ]


def test_merge_sequence_matches_python_reference(spark):
    docs = load_table(spark, SF_DIR, "documents").limit(300)
    got = [
        (m.left, m.right, m.freq)
        for m in bpe_train(docs, num_merges=20, min_freq=2)
    ]
    want = ref_train(_texts(spark, 300), 20, 2)
    assert got == want and len(got) == 20


def test_merge_sequence_greedy_overlap_semantics(spark):
    """'aaa' under merge (a,a) must emit [aa, a] — greedy leftmost
    non-overlapping, the fold's contract."""
    df = spark.createDataFrame(
        [(1, "aaa aaa aa"), (2, "aaa b b b")], "doc_id long, text string"
    )
    got = [
        (m.left, m.right, m.freq)
        for m in bpe_train(df, num_merges=3, min_freq=2)
    ]
    want = ref_train(["aaa aaa aa", "aaa b b b"], 3, 2)
    assert got == want
    # iteration 0 counts 'aaa' as TWO (a,a) occurrences, 'aa' as one:
    # 3 docs-worth -> (a,a) freq = 2+2+1+2 = 7 over both docs
    assert got[0] == ("a", "a", 7)


def test_encode_matches_reference_and_roundtrips(spark):
    docs = load_table(spark, SF_DIR, "documents").limit(300)
    merges = bpe_train(docs, num_merges=20, min_freq=2)
    ref_rules = [(m.left, m.right, m.freq) for m in merges]
    got = {
        r.doc_id: (r.n_words, r.n_pieces, r.pieces)
        for r in bpe_encode(docs, merges).collect()
    }
    for row in docs.select("doc_id", "text").collect():
        words = row.text.split()
        pieces: list[str] = []
        for w in words:
            pieces.extend(ref_encode_word(w, ref_rules))
        assert got[row.doc_id] == (
            len(words),
            len(pieces),
            " ".join(pieces),
        ), row.doc_id
        # lossless: concatenating each word's pieces restores the word
        # (checked via the reference split — piece joins are per-word)
    assert len(got) == docs.count()


def test_encode_roundtrip_lossless(spark):
    """Pieces concatenate back to the exact word sequence: encode
    drops nothing and invents nothing."""
    docs = load_table(spark, SF_DIR, "documents").limit(100)
    merges = bpe_train(docs, num_merges=12, min_freq=2)
    enc = {r.doc_id: r.pieces for r in bpe_encode(docs, merges).collect()}
    for row in docs.select("doc_id", "text").collect():
        assert enc[row.doc_id].replace(" ", "") == "".join(row.text.split())


def test_pair_counts_kernel_matches_reference(spark):
    docs = load_table(spark, SF_DIR, "documents").limit(200)
    got = {
        (r.left, r.right): r.pair_freq
        for r in bpe_pair_counts(docs).collect()
    }
    pc: Counter = Counter()
    for w, f in ref_word_freqs(_texts(spark, 200)).items():
        for pair in zip(w, w[1:]):
            pc[pair] += f
    assert got == dict(pc)


def test_train_stops_when_no_pair_reaches_min_freq(spark):
    df = spark.createDataFrame(
        [(1, "ab cd ef")], "doc_id long, text string"
    )
    assert bpe_train(df, num_merges=5, min_freq=2) == []
    one = bpe_train(df, num_merges=50, min_freq=1)
    # every pair is unique (freq 1): merges until words are single
    # symbols; 3 words x 1 merge each
    assert len(one) == 3 and all(m.freq == 1 for m in one)


def test_merge_artifact_roundtrip(spark, tmp_path):
    """Save/load of the trained rule list is lossless, and encoding
    from the loaded artifact equals encoding from the in-memory
    rules — the cross-session tokenizer-artifact contract."""
    from pyspark_airflow_weather_etl_spark.operators.bpe import (
        bpe_load_merges,
        bpe_save_merges,
    )

    docs = load_table(spark, SF_DIR, "documents").limit(200)
    merges = bpe_train(docs, num_merges=12, min_freq=2)
    path = str(tmp_path / "merges")
    bpe_save_merges(spark, merges, path)
    loaded = bpe_load_merges(spark, path)
    assert loaded == merges
    a = sorted(
        map(tuple, bpe_encode(docs, merges).collect())
    )
    b = sorted(
        map(tuple, bpe_encode(docs, loaded).collect())
    )
    assert a == b


def test_batched_training_equals_sequential(spark):
    """batch_rounds amortizes driver round-trips without changing ONE
    learned rule: full merge-list equality (ranks, pairs, recorded
    frequencies) vs the one-rule-per-round trainer on the fixture
    corpus, at several batch sizes."""
    docs = load_table(spark, SF_DIR, "documents")
    seq = bpe_train(docs, num_merges=20, min_freq=2)
    for m in (4, 8, 64):
        got = bpe_train(docs, num_merges=20, min_freq=2, batch_rounds=m)
        assert got == seq, f"batch_rounds={m} diverged"


def test_batched_training_adversarial_interactions(spark):
    """Corpora built to punish unsafe batching: top pairs that share
    symbols (applying one changes the other's count), a merge whose
    concatenation recreates an EARLIER round's merged symbol, and
    equal-count ties at the batch boundary. The safe-prefix rules
    must degrade to sequential behavior, not diverge."""
    cases = [
        # interacting top pairs: (a,b) and (b,c) share b
        ["a b c " * 50 + "a b " * 5, "b c d " * 30],
        # self-interacting pair (a,a) plus overlap chains
        ["a a a a " * 40, "a a b " * 20, "b b b " * 10],
        # merged-symbol collision: learn (a, bc) early, later (ab, c)
        # would recreate pairs with the existing 'abc' symbol
        ["a bc " * 60, "ab c " * 40, "abc x " * 30, "x y " * 25],
        # flat tie plateau: many disjoint pairs at the same count
        ["a b " * 7, "c d " * 7, "e f " * 7, "g h " * 7, "b a " * 7],
    ]
    for texts in cases:
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)],
            "doc_id bigint, text string",
        )
        seq = bpe_train(df, num_merges=12, min_freq=2)
        for m in (2, 3, 16):
            got = bpe_train(df, num_merges=12, min_freq=2, batch_rounds=m)
            assert got == seq, f"case={texts[0][:20]!r} m={m}"


def test_adaptive_batching_equals_sequential(spark):
    """adaptive=True moves only the driver-round count (doubling on
    un-truncated rounds, halving on heavy truncation) — the learned
    rule list stays identical to the sequential trainer, on the
    fixture corpus and on the adversarial interaction cases."""
    docs = load_table(spark, SF_DIR, "documents")
    seq = bpe_train(docs, num_merges=20, min_freq=2)
    got = bpe_train(
        docs, num_merges=20, min_freq=2, batch_rounds=2, adaptive=True
    )
    assert got == seq
    adversarial = ["a b c " * 50 + "a b " * 5, "b c d " * 30]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(adversarial)],
        "doc_id bigint, text string",
    )
    seq = bpe_train(df, num_merges=12, min_freq=2)
    got = bpe_train(
        df, num_merges=12, min_freq=2, batch_rounds=1, adaptive=True
    )
    assert got == seq


def test_incremental_recount_equals_full(spark):
    """recount='incremental' (delta-maintained pair-frequency state)
    learns the IDENTICAL rule list — ranks, pairs, and recorded
    frequencies — as recount='full' (re-aggregate everything each
    round), across batch sizes, the adaptive path, and the
    adversarial corpora (interacting pairs, merged-symbol collisions
    that make existing pair counts GROW, tie plateaus)."""
    import pytest

    docs = load_table(spark, SF_DIR, "documents")
    for kw in (
        dict(num_merges=20, min_freq=2),
        dict(num_merges=20, min_freq=2, batch_rounds=8),
        dict(num_merges=20, min_freq=2, batch_rounds=2, adaptive=True),
    ):
        inc = bpe_train(docs, recount="incremental", **kw)
        full = bpe_train(docs, recount="full", **kw)
        assert inc == full, f"kwargs={kw}"
    cases = [
        ["a b c " * 50 + "a b " * 5, "b c d " * 30],
        ["a a a a " * 40, "a a b " * 20, "b b b " * 10],
        ["a bc " * 60, "ab c " * 40, "abc x " * 30, "x y " * 25],
        ["a b " * 7, "c d " * 7, "e f " * 7, "g h " * 7, "b a " * 7],
    ]
    for texts in cases:
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)],
            "doc_id bigint, text string",
        )
        for m in (1, 3, 16):
            inc = bpe_train(
                df, num_merges=12, min_freq=2, batch_rounds=m,
                recount="incremental",
            )
            full = bpe_train(
                df, num_merges=12, min_freq=2, batch_rounds=m,
                recount="full",
            )
            assert inc == full, f"case={texts[0][:20]!r} m={m}"
    # 'auto' (the default) dispatches by vocab size without changing
    # results — fixture vocab fits the driver, so it routes to
    # 'driver'; same rules as the distributed trainer either way
    auto = bpe_train(docs, num_merges=20, min_freq=2, recount="auto")
    assert auto == bpe_train(docs, num_merges=20, min_freq=2,
                             recount="full")
    with pytest.raises(ValueError):
        bpe_train(docs, num_merges=2, recount="nope")


def test_driver_training_equals_distributed(spark):
    """recount='driver' (the whole merge loop driver-side over the
    collected vocab — zero jobs per round, VERDICT r13 #1) learns the
    IDENTICAL rule list — ranks, pairs, recorded frequencies — as the
    distributed trainer, on the fixture corpus, deep rule lists, the
    adversarial corpora (interacting pairs, merged-symbol collisions
    that make existing counts GROW, tie plateaus, min_freq stops),
    and the pure-Python full-recount reference."""
    docs = load_table(spark, SF_DIR, "documents")
    for kw in (
        dict(num_merges=20, min_freq=2),
        dict(num_merges=64, min_freq=2),
        dict(num_merges=20, min_freq=1),
        dict(num_merges=500, min_freq=5),  # past the min_freq stop
    ):
        drv = bpe_train(docs, recount="driver", **kw)
        full = bpe_train(docs, recount="full", batch_rounds=8, **kw)
        assert drv == full, f"kwargs={kw}"
    cases = [
        ["a b c " * 50 + "a b " * 5, "b c d " * 30],
        ["a a a a " * 40, "a a b " * 20, "b b b " * 10],
        ["a bc " * 60, "ab c " * 40, "abc x " * 30, "x y " * 25],
        ["a b " * 7, "c d " * 7, "e f " * 7, "g h " * 7, "b a " * 7],
        ["aaaa bbbb " * 30, "aaab " * 25, "abab " * 20],
    ]
    for texts in cases:
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)],
            "doc_id bigint, text string",
        )
        drv = bpe_train(df, num_merges=12, min_freq=2, recount="driver")
        full = bpe_train(df, num_merges=12, min_freq=2, recount="full")
        assert drv == full, f"case={texts[0][:20]!r}"
        ref = ref_train(texts, num_merges=12, min_freq=2)
        assert [(m.left, m.right, m.freq) for m in drv] == ref
    # encode with driver-trained rules is byte-identical downstream
    drv = bpe_train(docs, num_merges=24, min_freq=2, recount="driver")
    full = bpe_train(docs, num_merges=24, min_freq=2, recount="full")
    enc_d = sorted(map(tuple, bpe_encode(docs, drv).collect()))
    enc_f = sorted(map(tuple, bpe_encode(docs, full).collect()))
    assert enc_d == enc_f


def test_auto_dispatch_respects_merge_ratio(spark, monkeypatch):
    """'auto' goes driver-side only when the merge count clears the
    vocab/_DRIVER_TRAIN_WORDS_PER_MERGE crossover — a big vocab with
    few merges keeps the distributed trainer (round-14 measurement:
    the driver loop's setup is vocab-proportional). Dispatch is
    observed by patching both implementations' entry points; results
    are equality-covered elsewhere."""
    from pyspark_airflow_weather_etl_spark.operators import bpe as B

    from pyspark_airflow_weather_etl_spark.operators.bpe import (
        _DRIVER_TRAIN_WORDS_PER_MERGE as K,
    )

    # ~25k distinct words: above K·1, below K·3
    df = spark.range(25_000).selectExpr(
        "id as doc_id",
        "concat('w', cast(id as string), 'x', ' q', "
        "cast(id % 7 as string)) as text",
    )
    picked = {}
    real_driver = B._bpe_train_driver
    real_pairs = B._pair_counts_of

    def spy_driver(rows, n, mf):
        picked["mode"] = "driver"
        return real_driver(rows, n, mf)

    def spy_pairs(vocab):
        picked.setdefault("mode", "full")
        return real_pairs(vocab)

    monkeypatch.setattr(B, "_bpe_train_driver", spy_driver)
    monkeypatch.setattr(B, "_pair_counts_of", spy_pairs)
    picked.clear()
    B.bpe_train(df, num_merges=1, min_freq=2, recount="auto")
    assert picked["mode"] == "full"  # ~25k words > K * 1 merge
    picked.clear()
    B.bpe_train(df, num_merges=3, min_freq=2, recount="auto")
    assert picked["mode"] == "driver"  # ~25k <= K * 3
    assert K < 25_007 <= 3 * K  # the fixture straddles the constant
