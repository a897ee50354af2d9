#!/usr/bin/env python3
"""The r11 spread()-guard rollout, demonstrated (VERDICT r10 #1).

One cell per newly-guarded text family, on the exact shape the guard
exists for: a NARROW upstream — the blown-up docs table written as a
SINGLE parquet file, so the scan opens as one task and every per-row
CPU stage downstream would serialize onto it. Each cell is timed
twice:

  before   dedup.spread monkeypatched to identity (plus the
           module-level bindings the guarded operators import) —
           byte-identical to the pre-r11 operators
  after    the shipped guard

The delta IS the guard's value on this shape; at production scale
(thousands of splits) both paths are identical because spread() is a
no-op on wide scans.

Usage:
    python tools/bench_spread_guard.py            # factor 30
    python tools/bench_spread_guard.py 10         # custom factor
    SPARK_GRAFT_SPREAD_CELLS=dsir,countmin python ...  # subset

Prints one JSON line per cell {family, query, before_s, after_s,
speedup} and a summary line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from stockanalyses_downloader_spark.caching import release_tracked
from stockanalyses_downloader_spark.operators import (bm25, bpe, dedup,
                                                      dsir, langid,
                                                      ngram_lm, unigram)
from stockanalyses_downloader_spark.queries import all_queries
from stockanalyses_downloader_spark.session import get_session
from stockanalyses_downloader_spark.sources.tables import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from scale_common import blow_up_docs  # noqa: E402 — shared disjoint recipe

# Modules whose `spread` binding must be identity-patched for the
# "before" leg. Derived DYNAMICALLY: any operators/queries module
# holding a module-level `spread` attribute gets rebound, so a future
# refactor from function-level to module-level import cannot silently
# run the "before" leg WITH the guard (a hand-maintained list would
# understate the curve with no error).
import stockanalyses_downloader_spark.operators as _ops_pkg
import stockanalyses_downloader_spark.queries as _q_pkg


def _spread_bound_modules():
    import importlib
    import pkgutil
    mods = []
    for pkg in (_ops_pkg, _q_pkg):
        for info in pkgutil.iter_modules(pkg.__path__):
            m = importlib.import_module(f"{pkg.__name__}.{info.name}")
            if getattr(m, "spread", None) is dedup.spread and m is not dedup:
                mods.append(m)
    return mods


def _patch_identity():
    bound = _spread_bound_modules()
    originals = (bound, dedup.spread)
    dedup.spread = lambda df: df
    for m in bound:
        m.spread = dedup.spread
    return originals


def _restore(originals):
    bound, real = originals
    dedup.spread = real
    for m in bound:
        m.spread = real


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    spark = get_session("spread-guard")
    registry = all_queries()

    work = tempfile.mkdtemp(prefix="spread_guard_")
    # docs: the blow-up, as ONE file (the narrow upstream under test);
    # other tables symlinked from SF_DIR for queries that touch them
    docs_path = os.path.join(work, "documents.parquet")
    blow_up_docs(load_table(spark, SF_DIR, "documents"), factor) \
        .coalesce(1).write.mode("overwrite").parquet(docs_path)
    for name in os.listdir(SF_DIR):
        if name != "documents.parquet":
            os.symlink(os.path.join(SF_DIR, name),
                       os.path.join(work, name))

    def q(name):
        return lambda: registry[name].spark(spark, work) \
            .write.format("noop").mode("overwrite").save()

    def unigram_stage():
        # the guarded corpus-width stage of the unigram trainer (the
        # full EM loop's extra rounds measure the same word table)
        d = load_table(spark, work, "documents")
        unigram.candidate_pieces(unigram.word_counts(d)) \
            .write.format("noop").mode("overwrite").save()

    cells = [
        ("dsir", "dsir_selection_by_source", q("dsir_selection_by_source")),
        ("bpe", "bpe_pair_counts", q("bpe_pair_counts")),
        ("langid", "langid_nb_predictions", q("langid_nb_predictions")),
        ("ngram_lm", "doc_kn_perplexity", q("doc_kn_perplexity")),
        ("sketches", "token_countmin_sketch", q("token_countmin_sketch")),
        ("bm25", "bm25_search_topk", q("bm25_search_topk")),
        ("textprep", "pii_redaction_report", q("pii_redaction_report")),
        ("unigram", "word_counts+candidate_pieces", unigram_stage),
    ]
    only = os.environ.get("SPARK_GRAFT_SPREAD_CELLS")
    if only:
        keep = {s.strip() for s in only.split(",")}
        cells = [c for c in cells if c[0] in keep]

    results = []
    try:
        for family, qname, run in cells:
            run(); release_tracked()        # warm-up (codegen/JIT)
            originals = _patch_identity()
            try:
                t0 = time.perf_counter(); run()
                before = round(time.perf_counter() - t0, 2)
            finally:
                _restore(originals)
                release_tracked()
            t0 = time.perf_counter(); run()
            after = round(time.perf_counter() - t0, 2)
            release_tracked()
            rec = {"family": family, "query": qname,
                   "before_s": before, "after_s": after,
                   "speedup": round(before / after, 2) if after else None}
            results.append(rec)
            print(json.dumps(rec))
    finally:
        shutil.rmtree(work, ignore_errors=True)
    print(json.dumps({"metric": "spread_guard_ab", "factor": factor,
                      "docs_file_count": 1, "runs": results}))


if __name__ == "__main__":
    main()
