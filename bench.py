#!/usr/bin/env python3
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line with per-query wall seconds.

Each query is forced through the noop sink (full materialization of
every output column — count() alone lets Catalyst prune the work).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from stockanalyses_downloader_spark.caching import release_tracked  # noqa: E402
from stockanalyses_downloader_spark.queries import all_queries  # noqa: E402
from stockanalyses_downloader_spark.session import (DEFAULT_SF_DIR,  # noqa: E402
                                                    get_session)

HEADLINE = [
    "flagship_latest_mid",
    "rest_pipeline_messages",
    "ticks_asof_quotes",
    "vwap_by_isin",
    "weekly_ohlc_candles",
    "pricing_summary",
    "shipping_priority",
    "regional_revenue",
    "event_sessionization",
    "exact_dedup_docs",
    "doc_fingerprints",
    "ngram_jaccard_near_dups",
    "minhash_near_dups",
    "cosine_topk_bruteforce",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or "0.1")
    spark = get_session("bench")
    registry = all_queries()

    # JVM/codegen warm-up outside the timings: run every headline
    # query once at the tiny SF so each timed run measures the
    # steady-state plan, not its first-run whole-stage-codegen compile
    # (the 64-min-aggregate minhash plan alone costs ~2 s of javac on
    # first execution). Guarded per query: a broken warm-up must not
    # take the bench down.
    for name in HEADLINE:
        try:
            registry[name].spark(
                spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
        except Exception as exc:  # noqa: BLE001
            print(f"warmup {name} failed: {exc!r}", file=sys.stderr)
        finally:
            # persist-lifecycle hygiene: warm-up caches are sf0.001
            # plans, useless to the timed sf runs — drop them
            release_tracked()

    # Per-query failure isolation: one red query records an error
    # string and the suite keeps going — the bench signal degrades
    # gracefully, never to zero (BENCH_r02 died whole on one
    # AnalysisException; never again).
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in HEADLINE:
        q = registry[name]
        start = time.perf_counter()
        try:
            q.spark(spark, sf_dir).write.format("noop").mode("overwrite").save()
            timings[name] = round(time.perf_counter() - start, 3)
        except Exception as exc:  # noqa: BLE001
            errors[name] = f"{type(exc).__name__}: {str(exc).splitlines()[0][:300]}"
        finally:
            # release AFTER the timing stops: within-query persists are
            # part of the measured plan; carrying them into the NEXT
            # query is the leak (headline queries share no subplans at
            # the same SF, so this doesn't change what's measured)
            release_tracked()

    # value is the cross-round comparison number — a partial sum is
    # not comparable to a full one, so report null when any query
    # errored (n_ok + per-query timings still tell the whole story)
    total = round(sum(timings.values()), 3) if not errors else None
    out = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "n_ok": len(timings),
        "queries": timings,
        "sf": sf,
    }
    if errors:
        out["errors"] = errors
    print(json.dumps(out))


if __name__ == "__main__":
    main()
