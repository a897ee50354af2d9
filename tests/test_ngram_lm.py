"""Kneser-Ney bigram LM (operators/ngram_lm): exact normalization
over the full vocabulary, pure-Python parity, and the continuation-
count signature that distinguishes KN from MLE backoff. The trained
model's probabilities are DuckDB-hash-oracled at the query level
(bigram_kn_probs); these tests pin what the ratios MEAN."""

from __future__ import annotations

from collections import Counter, defaultdict

from pyspark.sql import functions as F

from stockanalyses_downloader_spark.operators import ngram_lm
from stockanalyses_downloader_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"
D = ngram_lm.KN_DISCOUNT


def _python_kn(texts: list[str]):
    bg: Counter = Counter()
    for t in texts:
        ts = t.lower().split()
        bg.update(zip(ts, ts[1:]))
    c1: Counter = Counter()
    n1fw: Counter = Counter()
    n1bw: Counter = Counter()
    for (w1, w2), c in bg.items():
        c1[w1] += c
        n1fw[w1] += 1
        n1bw[w2] += 1
    n_types = len(bg)

    def p(w1, w2):
        if w1 not in c1 or w2 not in n1bw:
            return None
        observed = max(bg.get((w1, w2), 0) - D, 0.0) / c1[w1]
        return observed + ((D * n1fw[w1]) / c1[w1]) * (n1bw[w2] / n_types)

    return p, c1, n1bw


def test_kn_matches_python_on_fixture(spark):
    docs = load_table(spark, SF, "documents")
    texts = [r["text"] for r in docs.select("text").collect()]
    p_ref, _, _ = _python_kn(texts)
    got = ngram_lm.kn_observed_probs(docs).collect()
    assert len(got) > 100  # non-vacuous on the fixture
    for r in got:
        ref = p_ref(r["w1"], r["w2"])
        assert abs(r["p_kn"] - ref) < 1e-12, (r["w1"], r["w2"])


def test_kn_full_vocab_normalization(spark):
    """Per context, observed + unseen probabilities sum to EXACTLY 1 —
    the discount mass re-enters through the continuation
    distribution. Scored through the real kn_score_pairs path over
    the full cross product."""
    docs = load_table(spark, SF, "documents")
    model = ngram_lm.kn_bigram_model(ngram_lm.bigram_pairs(docs))
    bg, ctx, cont, tot = model
    all_pairs = (ctx.select("w1").crossJoin(
        cont.select("w2")))
    scored = ngram_lm.kn_score_pairs(model, all_pairs)
    sums = (scored.groupBy("w1")
            .agg(F.sum(F.col("p_kn").cast("decimal(30,20)"))
                 .cast("double").alias("s")).collect())
    assert len(sums) > 10
    for r in sums:
        assert abs(r["s"] - 1.0) < 1e-9, (r["w1"], r["s"])


def test_kn_continuation_signature(spark):
    """'francisco' follows ONLY 'san' (high raw count, one context);
    'cat' follows many different contexts with lower total count.
    After an unseen context, KN must prefer 'cat' — raw-frequency
    backoff would prefer 'francisco'."""
    rows = [(0, "san francisco " * 20)]
    rows += [(i + 1, f"ctx{i} cat sat") for i in range(8)]
    rows += [(100, "unseen zzz")]  # makes 'zzz' a known continuation
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    model = ngram_lm.kn_bigram_model(ngram_lm.bigram_pairs(docs))
    # raw counts: francisco 20 vs cat 8 — frequency points the wrong way
    bg = {(r["w1"], r["w2"]): r["c12"] for r in model[0].collect()}
    assert bg[("san", "francisco")] == 20
    pairs = spark.createDataFrame(
        [("unseen", "francisco"), ("unseen", "cat")],
        "w1 string, w2 string")
    got = {r["w2"]: r["p_kn"]
           for r in ngram_lm.kn_score_pairs(model, pairs).collect()}
    assert got["cat"] > got["francisco"], got


def test_kn_oov_pairs_score_null(spark):
    docs = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    model = ngram_lm.kn_bigram_model(ngram_lm.bigram_pairs(docs))
    pairs = spark.createDataFrame(
        [("a", "b"), ("zzz", "b"), ("a", "zzz")],
        "w1 string, w2 string")
    got = {(r["w1"], r["w2"]): r["p_kn"]
           for r in ngram_lm.kn_score_pairs(model, pairs).collect()}
    assert got[("a", "b")] is not None
    assert got[("zzz", "b")] is None
    assert got[("a", "zzz")] is None


def test_kn_perplexity_flags_shuffled_text(spark, tmp_path):
    """The LM-filter semantic pin: token-SHUFFLED variants of natural
    docs (same unigram stats, broken sequences) must score higher
    perplexity than the naturals they were shuffled from. Planted
    into a temp sf_dir read through the ordinary query path."""
    from stockanalyses_downloader_spark.queries.text_queries import (
        doc_kn_perplexity)

    naturals = [
        "the quick brown fox jumps over the lazy dog and the quick "
        "brown fox runs home",
        "a stitch in time saves nine and a penny saved is a penny "
        "earned every time",
        "to be or not to be that is the question to be answered in "
        "time",
    ] * 4  # repetition gives the LM real transition statistics
    rows = []
    for i, t in enumerate(naturals):
        rows.append((i, t, "en", "nat"))
    for i, t in enumerate(naturals[:3]):
        toks = t.split()
        # deterministic derangement-ish shuffle: reverse + interleave
        shuf = toks[::2][::-1] + toks[1::2]
        rows.append((100 + i, " ".join(shuf), "en", "shuf"))
    import pyspark.sql.functions as SF
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string") \
        .withColumn("n_chars", SF.length("text"))
    docs.coalesce(1).write.parquet(f"{tmp_path}/documents.parquet")

    # log2_perplexity is monotone in perplexity: same discrimination
    got = {r["doc_id"]: r["log2_perplexity"]
           for r in doc_kn_perplexity(spark, str(tmp_path)).collect()}
    nat_mean = sum(got[i] for i in range(12)) / 12
    for i in range(3):
        assert got[100 + i] > nat_mean, (i, got[100 + i], nat_mean)


def test_kn_perplexity_runs_on_fixture(spark):
    from stockanalyses_downloader_spark.queries.text_queries import (
        doc_kn_perplexity)
    out = doc_kn_perplexity(spark, SF).collect()
    assert len(out) > 400
    for r in out[:50]:
        # perplexity > 1  <=>  log2_perplexity > 0
        assert r["log2_perplexity"] > 0.0
