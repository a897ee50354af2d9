"""BPE merge-pair learning (VERDICT r3 #4): the distributed learner's
merge sequence and the apply/encode path are pinned against a plain
pure-Python BPE reference (third-oracle style, like decontamination's).
"""

from __future__ import annotations

import collections
import re

import pytest

from conftest import SF_SMALL

from stockanalyses_downloader_spark.operators import bpe
from stockanalyses_downloader_spark.sources.tables import load_table

_RX = re.compile(bpe.BPE_PRETOKEN_RX)


def _py_learn(corpus: list[str], n_merges: int):
    """Reference BPE: greedy most-frequent adjacent pair, ties broken
    lexicographically, single-pass left-to-right merge application."""
    vocab: dict[tuple, int] = collections.Counter()
    for t in corpus:
        for w in _RX.findall(t):
            vocab[tuple(w)] += 1
    merges = []
    for rank in range(n_merges):
        pairs: collections.Counter = collections.Counter()
        for syms, n in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += n
        if not pairs:
            break
        (left, right), count = min(pairs.items(),
                                   key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, left, right, left + right, count))
        new_vocab: dict[tuple, int] = {}
        for syms, n in vocab.items():
            out: list[str] = []
            for x in syms:
                if out and out[-1] == left and x == right:
                    out[-1] = left + right
                else:
                    out.append(x)
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + n
        vocab = new_vocab
    return merges


def _py_encode(text: str, merges: list[tuple[str, str]]) -> list[str]:
    out: list[str] = []
    for w in _RX.findall(text):
        syms = list(w)
        for left, right in merges:
            nxt: list[str] = []
            for x in syms:
                if nxt and nxt[-1] == left and x == right:
                    nxt[-1] = left + right
                else:
                    nxt.append(x)
            syms = nxt
        out.extend(syms)
    return out


@pytest.fixture(scope="module")
def corpus_df(spark):
    rows = [(0, "low low low low low lower lower newest newest newest "
                "newest newest newest widest widest widest"),
            (1, "the cat sat on the mat, the cat."),
            (2, "abc123 abc123 x1 2y zz-zz"),
            (3, "a"),  # single-char pretokens: no pairs to count
            (4, "newest lowest widest nest rest west")]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bpe_merge_sequence_matches_reference(spark, corpus_df):
    corpus = [r.text for r in corpus_df.orderBy("doc_id").collect()]
    expected = _py_learn(corpus, 10)
    got = [tuple(r) for r in bpe.learn_bpe_merges(corpus_df, 10).collect()]
    assert got == expected
    assert len(got) == 10  # corpus is rich enough for the full budget


def test_bpe_early_stop_on_exhausted_vocab(spark):
    """A vocab of single-symbol pretokens has no adjacent pairs after
    few merges — the learner must stop, not loop or error."""
    df = spark.createDataFrame([(0, "ab ab ab")], "doc_id long, text string")
    got = bpe.learn_bpe_merges(df, 50).collect()
    assert [(r.sym_left, r.sym_right, r.pair_count) for r in got] \
        == [("a", "b", 3)]


def test_bpe_tokenization_matches_reference(spark, corpus_df):
    corpus = {r.doc_id: r.text for r in corpus_df.collect()}
    merges = [(m[1], m[2]) for m in _py_learn(list(
        corpus[k] for k in sorted(corpus)), 10)]
    got = {r["doc_id"]: r["tokens"]
           for r in bpe.tokenize_with_merges(corpus_df, merges).collect()}
    assert set(got) == set(corpus)
    for doc_id, text in corpus.items():
        assert got[doc_id] == _py_encode(text, merges), doc_id


def test_merge_fold_exhaustive_vs_reference(spark):
    """The JVM fold in _merge_once must implement single-pass greedy
    left-to-right merging EXACTLY — exhaustively checked against the
    Python reference over every symbol sequence up to length 6 from
    the alphabet {a, b, ab} with merge pair (a, b). This alphabet
    packs the tricky cases: overlapping runs (a a b), merged-token
    collisions (the literal symbol 'ab' must NOT re-merge with a
    following b in the same round), and back-to-back merges
    (a b a b). One Spark job evaluates all 1092 sequences."""
    import itertools

    alphabet = ["a", "b", "ab"]
    seqs = [list(s) for n in range(1, 7)
            for s in itertools.product(alphabet, repeat=n)]

    def py_merge(syms, left, right):
        out = []
        for x in syms:
            if out and out[-1] == left and x == right:
                out[-1] = left + right
            else:
                out.append(x)
        return out

    from pyspark.sql import functions as F
    df = spark.createDataFrame([(i, s) for i, s in enumerate(seqs)],
                               "i long, syms array<string>")
    got = {r["i"]: r["m"] for r in
           df.select("i", bpe._merge_once(F.col("syms"), "a", "b")
                     .alias("m")).collect()}
    for i, s in enumerate(seqs):
        assert got[i] == py_merge(s, "a", "b"), (s, got[i])


def test_bpe_compression_on_real_corpus(spark):
    """Sanity at fixture scale: learned merges strictly shrink the
    token stream vs raw characters and never grow vs pretokens
    (merging only concatenates), and round 1 equals the oracled
    pair-count argmax."""
    from pyspark.sql import functions as F
    d = load_table(spark, SF_SMALL, "documents")
    merges_df = bpe.learn_bpe_merges(d, 8)
    merges = [(r["sym_left"], r["sym_right"]) for r in merges_df.collect()]
    assert len(merges) == 8

    top = (bpe.first_round_pair_counts(d)
           .orderBy(F.col("pair_count").desc(), "sym_left", "sym_right")
           .first())
    assert (top["sym_left"], top["sym_right"]) == merges[0]

    enc = bpe.tokenize_with_merges(d, merges)
    stats = (d.join(enc, "doc_id")
             .select((F.length(F.regexp_replace("text", r"\s+", ""))
                      ).alias("n_chars"), "n_bpe_tokens")
             .agg(F.sum("n_chars").alias("chars"),
                  F.sum("n_bpe_tokens").alias("toks"))
             .first())
    assert stats["toks"] < stats["chars"]


def test_tokenize_keeps_zero_pretoken_docs(spark):
    """ADVICE r4: a doc whose text yields no pretokens (empty or
    whitespace-only) must still appear in the encode output with an
    empty token array, not silently vanish from the fan-back join."""
    rows = [(0, "cat sat"), (1, ""), (2, "   \t  "), (3, "dog")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           bpe.tokenize_with_merges(df, [("c", "a")]).collect()}
    assert set(got) == {0, 1, 2, 3}
    assert got[1]["tokens"] == [] and got[1]["n_bpe_tokens"] == 0
    assert got[2]["tokens"] == [] and got[2]["n_bpe_tokens"] == 0
    assert got[0]["n_bpe_tokens"] > 0 and got[3]["n_bpe_tokens"] > 0


def test_token_counts_match_full_encoder(spark, corpus_df):
    """r14 counts-only apply path: bpe_token_counts must equal the
    full encoder's size(tokens) per doc — including the empty-doc 0 —
    and keep the int schema the query's hash contract pins."""
    merges = [(m[1], m[2]) for m in _py_learn(
        [r.text for r in corpus_df.orderBy("doc_id").collect()], 10)]
    rows = [(0, "cat sat"), (1, ""), (2, "   \t  "), (3, "dog")]
    extra = spark.createDataFrame(rows, "doc_id long, text string")
    for df in (corpus_df, extra):
        full = {r["doc_id"]: r["n_bpe_tokens"]
                for r in bpe.tokenize_with_merges(df, merges).collect()}
        counts = bpe.bpe_token_counts(df, merges)
        assert counts.schema["n_bpe_tokens"].dataType.simpleString() \
            == "int"
        got = {r["doc_id"]: r["n_bpe_tokens"] for r in counts.collect()}
        assert got == full


def test_bpe_apply_is_bounded_jobs(spark):
    """VERDICT r4 #3: with the merge table FIT once (module memo),
    the registered doc_bpe_tokenization query is pure APPLY — a small
    bounded job count per run, not ~35 sequential training jobs.
    Pinned as a ceiling with AQE off (one job per action)."""
    from stockanalyses_downloader_spark.queries import text_queries as tq

    tq._bpe_merges_for(spark, SF_SMALL, 16)  # fit (or reuse) the model
    aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.sparkContext.setJobGroup("bpe-apply", "bounded-jobs pin")
    try:
        n = tq.doc_bpe_tokenization(spark, SF_SMALL).count()
        n_jobs = len(spark.sparkContext.statusTracker()
                     .getJobIdsForGroup("bpe-apply"))
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe)
        spark.sparkContext.setJobGroup("post-bpe", "reset")
    assert n > 0
    assert n_jobs <= 3, f"apply path ran {n_jobs} jobs (re-training?)"


def test_bpe_oracles_survive_early_pair_exhaustion(spark, tmp_path):
    """A corpus that fully merges before n_merges rounds must stop the
    SQL oracle the same way learn_bpe_merges stops: the sentinel b{r}
    row keeps later vocab CTEs alive and is filtered from the merge
    sequence (review finding r7c — an empty argmax CTE used to
    annihilate every later vocab through the cross join)."""
    import duckdb
    from stockanalyses_downloader_spark.queries.text_queries import (
        _bpe_merge_sequence_sql, _bpe_tokenization_sql)
    docs = spark.createDataFrame([(1, "ab ab"), (2, "a b")],
                                 "doc_id long, text string")
    learned = bpe.learn_bpe_merges(docs, n_merges=16).collect()
    encoded = {r["doc_id"]: r["n_bpe_tokens"]
               for r in bpe.tokenize_with_merges(
                   docs, [(r["sym_left"], r["sym_right"])
                          for r in learned]).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE documents AS SELECT * FROM (VALUES "
                "(1, 'ab ab'), (2, 'a b')) t(doc_id, text)")
    oracle_seq = con.execute(_bpe_merge_sequence_sql(16)).fetchall()
    oracle_tok = dict(con.execute(_bpe_tokenization_sql(16)).fetchall())
    assert [(r["merge_rank"], r["sym_left"], r["sym_right"],
             r["merged"], r["pair_count"]) for r in learned] == oracle_seq
    assert encoded == oracle_tok


def test_string_replace_encode_exhaustive_vs_fold(spark):
    """The r13 literal-string-replace merge chain inside
    tokenize_with_merges must reproduce single-pass greedy BPE
    EXACTLY, including across a chain of merges where later pairs
    consume earlier merged symbols. Exhaustive over every pretoken of
    length <= 6 from {a, b} (runs + alternations are where the
    delimiter emulation can go wrong) under a 3-deep merge chain
    whose later pairs reference merged tokens, plus a doc whose
    pretoken IS the delimiter control char (exercises the per-row
    fold fallback)."""
    import itertools

    merges = [("a", "a"), ("a", "b"), ("aa", "ab")]

    def py_merge(syms, left, right):
        out = []
        for x in syms:
            if out and out[-1] == left and x == right:
                out[-1] = left + right
            else:
                out.append(x)
        return out

    def py_encode(word):
        syms = list(word)
        for left, right in merges:
            syms = py_merge(syms, left, right)
        return syms

    words = ["".join(s) for n in range(1, 7)
             for s in itertools.product("ab", repeat=n)]
    docs = [(i, w) for i, w in enumerate(words)]
    docs.append((len(docs), "\x00"))      # delimiter-collision fallback
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r["tokens"]
           for r in bpe.tokenize_with_merges(df, merges).collect()}
    for i, w in enumerate(words):
        assert got[i] == py_encode(w), (w, got[i])
    assert got[len(words)] == ["\x00"]
