"""BM25 retrieval: exact parity against a pure-Python Okapi scorer on
the real fixture corpus, plus ranking invariants. The index side
(tf/dl/df/N/avgdl) is DuckDB-oracled at the query level
(bm25_doc_term_stats); these tests certify the ln-bearing scored path
the hash oracle can't."""

from __future__ import annotations

import math
from collections import Counter

from pyspark.sql import functions as F

from stockanalyses_downloader_spark.operators import bm25
from stockanalyses_downloader_spark.queries.text_queries import (
    _BM25_QUERIES, bm25_search_topk)
from stockanalyses_downloader_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _python_bm25(corpus: dict[int, str], qtext: str,
                 k1: float = bm25.BM25_K1, b: float = bm25.BM25_B
                 ) -> dict[int, float]:
    """Reference scorer — same Lucene-variant formula, floats summed
    in sorted-term order so the comparison tolerance only absorbs
    commutativity, not formula drift."""
    tfs = {d: Counter(t.lower().split()) for d, t in corpus.items()}
    dls = {d: sum(c.values()) for d, c in tfs.items()}
    n = len(corpus)
    avgdl = sum(dls.values()) / n
    dfs = Counter()
    for c in tfs.values():
        dfs.update(c.keys())
    scores: dict[int, float] = {}
    for term in sorted(set(qtext.lower().split())):
        df = dfs.get(term, 0)
        if df == 0:
            continue
        idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
        for d, c in tfs.items():
            tf = c.get(term, 0)
            if tf == 0:
                continue
            norm = tf / (tf + k1 * (1 - b + b * dls[d] / avgdl))
            scores[d] = scores.get(d, 0.0) + idf * norm
    return scores


def test_bm25_matches_python_reference(spark):
    docs = load_table(spark, SF, "documents")
    corpus = {r["doc_id"]: r["text"]
              for r in docs.select("doc_id", "text").collect()}
    q = spark.createDataFrame(_BM25_QUERIES, "query_id int, qtext string")
    got = bm25.bm25_topk(docs, q, k=10).collect()
    assert len(got) == 3 * 10
    for qid, qtext in _BM25_QUERIES:
        ref = _python_bm25(corpus, qtext)
        ref_top = sorted(ref.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
        mine = sorted([r for r in got if r["query_id"] == qid],
                      key=lambda r: r["rank"])
        assert [r["doc_id"] for r in mine] == [d for d, _ in ref_top]
        for r, (_, s) in zip(mine, ref_top):
            assert abs(r["score"] - s) < 1e-9


def test_bm25_rank_invariants_and_query_shape(spark):
    out = bm25_search_topk(spark, SF).collect()
    by_q: dict[int, list] = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == {0, 1, 2}
    for rows in by_q.values():
        rows.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rows] == list(range(1, 11))
        scores = [r["score"] for r in rows]
        assert scores == sorted(scores, reverse=True)
        assert all(s > 0 for s in scores)
        assert len({r["doc_id"] for r in rows}) == 10


def test_bm25_absent_term_contributes_nothing(spark):
    """A query term missing from the corpus silently drops (inner join
    against tf) — scores equal the same query without it."""
    docs = load_table(spark, SF, "documents")
    q = spark.createDataFrame(
        [(0, "scan column"), (1, "scan column zzzunseen")],
        "query_id int, qtext string")
    got = bm25.bm25_topk(docs, q, k=5).collect()
    s0 = {r["doc_id"]: r["score"] for r in got if r["query_id"] == 0}
    s1 = {r["doc_id"]: r["score"] for r in got if r["query_id"] == 1}
    assert s0.keys() == s1.keys()
    for d in s0:
        assert abs(s0[d] - s1[d]) < 1e-12


def test_bm25_rarer_term_scores_higher_planted(spark):
    """IDF sanity on a planted corpus: with equal tf/dl, the doc
    matching the RARE query term outranks the doc matching the common
    one."""
    rows = [(1, "rare filler filler filler"),
            (2, "common filler filler filler")]
    rows += [(10 + i, f"common pad{i} pad{i} pad{i}") for i in range(8)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    q = spark.createDataFrame([(0, "rare common")],
                              "query_id int, qtext string")
    got = {r["doc_id"]: r["rank"]
           for r in bm25.bm25_topk(docs, q, k=10).collect()}
    assert got[1] == 1, got
