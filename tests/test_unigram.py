"""Unigram-LM tokenizer (operators/unigram): pure-Python hard-EM
parity, learned-piece sanity, apply-path invariants."""

from __future__ import annotations

import math

from conftest import SF_SMALL
from stockanalyses_downloader_spark.operators import unigram
from stockanalyses_downloader_spark.sources.tables import load_table


def _py_train(texts, vocab_k=512, rounds=3,
              max_len=unigram.MAX_PIECE_LEN,
              min_count=unigram.MIN_COUNT):
    """Reference implementation of the EXACT same hard-EM."""
    wc: dict = {}
    for t in texts:
        for w in t.lower().strip().split():
            if w:
                wc[w] = wc.get(w, 0) + 1
    cands: dict = {}
    for w, c in wc.items():
        for i in range(len(w)):
            for j in range(i + 1, min(len(w), i + max_len) + 1):
                p = w[i:j]
                cands[p] = cands.get(p, 0) + c
    cands = {p: c for p, c in cands.items()
             if len(p) == 1 or c >= min_count}
    # r12 seed cap (re-baselined with the trainer): chars + top
    # SEED_FACTOR*vocab_k multi-char candidates by (count desc,
    # piece asc) — the same deterministic tie-break as the in-plan
    # TakeOrderedAndProject
    chars0 = {p: c for p, c in cands.items() if len(p) == 1}
    multi0 = sorted(((p, c) for p, c in cands.items() if len(p) > 1),
                    key=lambda t: (-t[1], t[0]))
    cands = dict(chars0)
    cands.update(dict(multi0[:unigram.SEED_FACTOR * vocab_k]))
    total0 = sum(cands.values())
    model = {p: math.log(c / total0) for p, c in cands.items()}
    for _ in range(rounds):
        logp = dict(model)
        unk = min(logp.values()) - 10.0
        usage: dict = {}
        for w, c in wc.items():
            for p in unigram._viterbi(w, logp, unk):
                usage[p] = usage.get(p, 0) + c
        total = sum(usage.values())
        fresh = {p: math.log(n / total) for p, n in usage.items()}
        chars = {p: lp for p, lp in fresh.items() if len(p) == 1}
        multi = sorted(((p, lp) for p, lp in fresh.items()
                        if len(p) > 1),
                       key=lambda t: (-t[1], t[0]))[:vocab_k]
        model = dict(chars)
        model.update(dict(multi))
    return sorted(model.items())


def test_unigram_seed_collect_is_bounded(spark):
    """VERDICT r11 #5: the seed vocabulary the trainer collects is
    capped in-plan at chars + SEED_FACTOR*vocab_k multi-char pieces —
    on a corpus with MORE qualifying multi-char candidates than the
    cap, the seed frame holds exactly the cap (top by count,
    piece-ascending tie-break), and every char still rides along
    uncapped."""
    from pyspark.sql import functions as F
    # 26*26 = 676 distinct bigrams, each seen twice (>= min_count)
    alpha = "abcdefghijklmnopqrstuvwxyz"
    text = " ".join(2 * [a + b for a in alpha for b in alpha])
    d = spark.createDataFrame([(0, text)], "doc_id long, text string")
    words = unigram.word_counts(d)
    vocab_k = 8                                  # cap = 160 < 676
    seed = unigram.seed_pieces(words, vocab_k).collect()
    multi = [r for r in seed if len(r["piece"]) > 1]
    chars = [r for r in seed if len(r["piece"]) == 1]
    assert len(multi) == unigram.SEED_FACTOR * vocab_k
    assert len(chars) == 26
    # top-by-count with piece tie-break: every bigram counts 2, so
    # the kept set is the lexicographic head of the bigram grid
    want = sorted(a + b for a in alpha for b in alpha)[:160]
    assert sorted(r["piece"] for r in multi) == want
    # and an under-cap corpus keeps every qualifying candidate
    d2 = spark.createDataFrame([(0, "aa bb aa bb")],
                               "doc_id long, text string")
    seed2 = unigram.seed_pieces(unigram.word_counts(d2), vocab_k)
    assert {r["piece"] for r in seed2.collect()} == {"a", "b", "aa", "bb"}


def test_unigram_training_matches_pure_python(spark):
    """Spark trainer == reference trainer on the real corpus:
    identical piece SET and log-probs to 1e-12 (same fold, same
    floats — the distributed aggregation only adds exact integer
    counts)."""
    d = load_table(spark, SF_SMALL, "documents").limit(120)
    texts = [r["text"] for r in d.select("text").collect()]
    got = unigram.train_unigram(d, vocab_k=128, rounds=2)
    want = _py_train(texts, vocab_k=128, rounds=2)
    assert [p for p, _ in got] == [p for p, _ in want]
    for (pg, lg), (pw, lw) in zip(got, want):
        assert abs(lg - lw) < 1e-12, (pg, lg, lw)


def test_unigram_learns_whole_words_and_segments_everything(spark):
    """On the fixture's small closed vocabulary the trainer promotes
    WHOLE words to single pieces (the compression unigram exists
    for), and the apply path covers every doc: n_pieces <= chars,
    n_pieces >= n_words (a word is >= 1 piece), zero-token docs
    survive with 0."""
    d = load_table(spark, SF_SMALL, "documents")
    pieces = unigram.train_unigram(d.limit(200), vocab_k=256, rounds=2)
    piece_set = {p for p, _ in pieces}
    # frequent 3-6 char corpus words should be single pieces
    assert {"the", "data", "query", "table"} & piece_set
    out = unigram.tokenize_with_pieces(d, pieces)
    rows = out.collect()
    assert len(rows) == d.count()
    for r in rows:
        assert r["n_pieces"] >= r["n_words"] >= 0
    # real compression: far fewer pieces than characters
    total_pieces = sum(r["n_pieces"] for r in rows)
    total_words = sum(r["n_words"] for r in rows)
    assert total_pieces < 2.2 * total_words  # near 1 piece/word here
