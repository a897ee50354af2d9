"""Trained char-trigram Naive Bayes language ID (operators/langid):
pure-Python parity, held-out accuracy, and the trained-beats-nothing
sanity on the real fixture."""

from __future__ import annotations

import math
import re

from pyspark.sql import functions as F

from stockanalyses_downloader_spark.operators import langid


def _py_nb(train_rows, score_texts, n=3, alpha=1.0):
    """Reference NB with the exact smoothing/scoring contract."""
    def grams(t):
        c = re.sub(r"\s+", " ", t.lower()).strip()
        return [c[i:i + n] for i in range(len(c) - n + 1)] \
            if len(c) >= n else []

    counts: dict = {}
    totals: dict = {}
    ndocs_per: dict = {}
    vocab = set()
    for text, lab in train_rows:
        ndocs_per[lab] = ndocs_per.get(lab, 0) + 1
        for g in grams(text):
            counts[(lab, g)] = counts.get((lab, g), 0) + 1
            totals[lab] = totals.get(lab, 0) + 1
            vocab.add(g)
    v = len(vocab)
    ndocs = sum(ndocs_per.values())
    out = []
    for text in score_texts:
        best = None
        for lab in sorted(totals):
            s = math.log(ndocs_per[lab] / ndocs)
            denom = totals[lab] + alpha * v
            for g in grams(text):
                c = counts.get((lab, g))
                # model contains only grams seen SOMEWHERE in training;
                # a gram outside the global vocab hits log_unseen too
                if c is not None:
                    s += math.log((c + alpha) / denom)
                else:
                    s += math.log(alpha / denom)
            if best is None or s > best[1] + 1e-15:
                best = (lab, s)
        out.append(best)
    return out


def test_nb_matches_pure_python(spark):
    """Spark NB == reference NB on a planted corpus, scores to 1e-9 —
    including a doc containing grams the model never saw."""
    train = [("the cat sat on the mat", "en"),
             ("the dog and the cat", "en"),
             ("der hund und die katze", "de"),
             ("die maus und der igel", "de")]
    score = ["the cat and the dog sat",
             "der igel und die maus",
             "xyzzy qqq der the"]        # unseen grams + mixed
    tr = spark.createDataFrame(train, "text string, lang string")
    logps, stats = langid.train_nb(tr)
    sc = spark.createDataFrame(
        [(i, t) for i, t in enumerate(score)], "doc_id long, text string")
    got = {r["doc_id"]: (r["predicted_lang"], r["best_logp"])
           for r in langid.score_nb(sc, logps, stats).collect()}
    want = _py_nb(train, score)
    for i, (lab, s) in enumerate(want):
        assert got[i][0] == lab
        assert abs(got[i][1] - s) < 1e-9


def test_nb_gramless_docs_get_prior_only_prediction(spark):
    """Docs whose normalized text is shorter than n chars produce zero
    grams — they must still appear in the output with the prior-only
    argmax (the majority-prior label), not silently vanish."""
    train = [("the cat sat on the mat", "en"),
             ("the dog and the cat sat", "en"),
             ("der hund und die katze", "de")]
    tr = spark.createDataFrame(train, "text string, lang string")
    logps, stats = langid.train_nb(tr)
    sc = spark.createDataFrame(
        [(0, "ab"), (1, ""), (2, "the cat sat")],
        "doc_id long, text string")
    got = {r["doc_id"]: r["predicted_lang"]
           for r in langid.score_nb(sc, logps, stats).collect()}
    assert set(got) == {0, 1, 2}, "gramless docs dropped from output"
    # prior-only argmax: en has 2/3 of training docs
    assert got[0] == "en" and got[1] == "en"
    assert got[2] == "en"


def test_nb_argmax_tie_breaks_to_lowest_label(spark):
    """The map-only fold's tie order must equal the old window's
    (score desc, label asc): with EQUAL priors, a gramless doc scores
    identically under every label and must resolve to the
    lexicographically lowest one."""
    train = [("the cat sat on the mat", "en"),
             ("der hund und die katze", "de")]   # 1 doc each: tied prior
    tr = spark.createDataFrame(train, "text string, lang string")
    logps, stats = langid.train_nb(tr)
    sc = spark.createDataFrame([(0, "ab")], "doc_id long, text string")
    row = langid.score_nb(sc, logps, stats).collect()[0]
    assert row["predicted_lang"] == "de"          # tie -> min label
    assert abs(row["best_logp"] - math.log(0.5)) < 1e-12


def test_nb_heldout_accuracy_on_planted_corpus(spark):
    """Held-out accuracy on a deterministic 4-language corpus with
    genuinely distinct character distributions (the FIXTURE's lang
    labels are independent of its text — every doc draws from the
    same English-ish token pool, so label recovery from text is
    impossible there by construction; planted data is the honest
    accuracy harness). Train on 2/3, score 1/3: accuracy >= 0.95 and
    far above the label prior."""
    pools = {
        "en": "the quick brown fox jumps over lazy dog with little time".split(),
        "de": "der schnelle braune fuchs springt ueber den faulen hund mit wenig zeit".split(),
        "fr": "le rapide renard brun saute par dessus le chien paresseux avec peu temps".split(),
        "es": "el rapido zorro marron salta sobre el perro perezoso con poco tiempo".split(),
    }
    import random
    rng = random.Random(1234)   # fixed seed: deterministic corpus
    rows = []
    i = 0
    for lang, pool in pools.items():
        for d in range(60):
            toks = rng.choices(pool, k=12 + d % 5)
            rows.append((i, " ".join(toks), lang))
            i += 1
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    train = df.filter(F.col("doc_id") % 3 != 0)
    test = df.filter(F.col("doc_id") % 3 == 0)
    logps, stats = langid.train_nb(train)
    pred = langid.score_nb(test, logps, stats)
    joined = (pred.join(test.select("doc_id", "lang"), "doc_id")
              .select((F.col("predicted_lang") == F.col("lang"))
                      .cast("int").alias("hit")))
    rows_out = joined.collect()
    acc = sum(r["hit"] for r in rows_out) / len(rows_out)
    assert acc >= 0.95, f"held-out accuracy {acc}"


def test_nb_duplicate_model_rows_sum_not_throw(spark):
    """ADVICE r12 low: an externally unioned gram_logps with duplicate
    (gram, label) rows must SUM the duplicates — the r11 join-based
    scoring's silent behavior — not hit map_from_entries'
    mapKeyDedupPolicy=EXCEPTION at runtime. A fully doubled model must
    therefore score identically to a model whose logps are doubled
    up front (unseen contributions stay 1x either way)."""
    train = [("the cat sat on the mat", "en"),
             ("the dog and the cat", "en"),
             ("der hund und die katze", "de")]
    tr = spark.createDataFrame(train, "text string, lang string")
    logps, stats = langid.train_nb(tr)
    sc = spark.createDataFrame(
        [(0, "the cat and the dog"), (1, "der hund xyzzy")],
        "doc_id long, text string")
    dup = logps.unionByName(logps)
    got = {r["doc_id"]: (r["predicted_lang"], r["best_logp"])
           for r in langid.score_nb(sc, dup, stats).collect()}
    doubled = logps.withColumn("logp", F.col("logp") * 2)
    want = {r["doc_id"]: (r["predicted_lang"], r["best_logp"])
            for r in langid.score_nb(sc, doubled, stats).collect()}
    assert set(got) == set(want)
    for i in want:
        assert got[i][0] == want[i][0]
        assert abs(got[i][1] - want[i][1]) < 1e-9


def test_with_char_grams_matches_column_form(spark):
    """r13 hoist parity: with_char_grams (normalization bound as a
    column, regex once per row) must emit exactly the same gram array
    as the inline char_grams_col expression."""
    rows = [(0, "The  cat\tSAT "), (1, "ab"), (2, ""), (3, "ümlaut ğq")]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["g"]
           for r in langid.with_char_grams(d, "text", 3, "g").collect()}
    want = {r["doc_id"]: r["g"]
            for r in d.select("doc_id",
                              langid.char_grams_col(F.col("text"), 3)
                              .alias("g")).collect()}
    assert got == want


def test_char_gram_normalize_once(spark):
    """r13: the corpus-explode path must evaluate the \\s+
    normalization regex ONCE per row — the inline lambda form re-ran
    it per gram position (O(len^2) regex per doc)."""
    d = spark.createDataFrame([(0, "a b c d")], "doc_id long, text string")
    q = langid.with_char_grams(d, "text", 3, "g").select("doc_id", "g")
    plan = q._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("regexp_replace") == 1, plan[:2000]
