#!/usr/bin/env python3
"""Full-headline scale tier (VERDICT r7 #3): run the COMPLETE 14-query
bench headline at a synthetic 10x blow-up of sf0.1 and record the
per-query wall ratio — turning the per-family 10x/30x curves
(tools/bench_*_scale.py) into one whole-suite statement: the headline
itself is sub-linear. Pass criterion (the verdict's): no query >3x
wall at 10x data with keys/blocks DISJOINT.

Blow-up recipe (disjoint copies, the same axis the per-family tools
use — data volume grows, per-key/per-block density and dup structure
stay constant):

  events     event_id += c*685,790 (2 * lcm(97,101,5,7) — every modular
             derivation in sources/synthetic.py is preserved exactly:
             status%97, zero-id%101, action%5, non-crypto%7);
             user_id += c*1,940 (= c*194*10: preserves isin = uid%97
             and exchange = uid%2, makes users DISJOINT per copy);
             ts += c*35 days (disjoint time ranges: weekly-candle and
             as-of groups grow 10x at constant per-group density)
  documents  doc_id += c*10M; every WORD gets a per-copy prefix, so
             shingle/minhash/jaccard vocabularies are DISJOINT across
             copies (no cross-copy near-dup cliques — the adversarial
             clique blow-up is bench_dedup_scale's separate axis);
             source gets a per-copy suffix, so the (lang, source)
             dedup BLOCKS are disjoint too — per-block sizes stay
             constant and the blocked self-joins scale linearly (the
             first run of this harness left blocks shared and measured
             the quadratic term: 22x wall at 10x — the blow-up must
             scale block COUNT, not block size, to test the plan);
             within-copy exact-dup structure is preserved (identical
             transformation of identical texts); n_chars recomputed
  embeddings vec_id += c*10M, vectors unchanged (the fixed _QUERY_IDS
             live in copy 0; candidate volume grows 10x)
  tpch       every *key column += c*10M on orders/lineitem/customer/
             supplier/part (FK sides shift together, so joins stay
             consistent and copy-disjoint); nation/region dims carried
             as-is (25/5 rows — copies join the same dims, so group
             counts stay fixed while group density grows 10x)

Usage:
    python tools/bench_headline_scale.py           # factors 1 10
    python tools/bench_headline_scale.py 1 10 30
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bench import HEADLINE
from stockanalyses_downloader_spark.caching import release_tracked
from stockanalyses_downloader_spark.queries import all_queries
from stockanalyses_downloader_spark.session import get_session
from stockanalyses_downloader_spark.sources.tables import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

_EVENT_SHIFT = 2 * 97 * 101 * 5 * 7   # 685,790
_USER_SHIFT = 194 * 10                # 1,940
_KEY_SHIFT = 10_000_000
_TS_SHIFT_DAYS = 35

_TPCH_KEYS = {
    "orders": ("o_orderkey", "o_custkey"),
    "lineitem": ("l_orderkey", "l_partkey", "l_suppkey"),
    "customer": ("c_custkey",),
    "supplier": ("s_suppkey",),
    "part": ("p_partkey",),
}


def _with_copies(df, factor: int, build_copy):
    """df UNION (factor-1 transformed copies); build_copy(df, c) maps
    the copy-index column ``c`` over every row of one copy."""
    if factor <= 1:
        return df
    c = F.col("__c")
    copies = (df.crossJoin(F.broadcast(
                  df.sparkSession.range(1, factor)
                  .select(F.col("id").alias("__c"))))
              .select(*build_copy(df, c)))
    return df.unionByName(copies)


def materialize(spark, factor: int, out_dir: str) -> None:
    """Blown tables are repartition(32)-written: a 10x table written
    as the 1-3 files the broadcast blow-up plan would emit caps scan
    parallelism at read time and fakes super-linear walls (measured:
    pricing_summary 5.3x from file-count starvation alone)."""
    os.makedirs(out_dir, exist_ok=True)

    ev = load_table(spark, SF_DIR, "events")
    _with_copies(ev, factor, lambda df, c: [
        (F.col("event_id") + c * _EVENT_SHIFT).alias("event_id"),
        (F.col("ts") + F.make_interval(days=(c * _TS_SHIFT_DAYS)
                                       .cast("int"))).alias("ts"),
        (F.col("user_id") + c * _USER_SHIFT).alias("user_id"),
        "event_type", "value", "props",
    ]).repartition(32).write.mode("overwrite").parquet(
        os.path.join(out_dir, "events.parquet"))

    # documents: the shared disjoint recipe (tools/scale_common.py —
    # also used by bench_ngram_spill and bench_spread_guard, so the
    # three tools' curves stay comparable by construction)
    from scale_common import blow_up_docs
    blow_up_docs(load_table(spark, SF_DIR, "documents"), factor) \
        .repartition(32) \
        .write.mode("overwrite").parquet(os.path.join(out_dir,
                                                      "documents.parquet"))

    emb = load_table(spark, SF_DIR, "embeddings")
    _with_copies(emb, factor, lambda df, c: [
        (F.col("vec_id") + c * _KEY_SHIFT).alias("vec_id"),
        "embedding", "label",
    ]).repartition(32).write.mode("overwrite").parquet(
        os.path.join(out_dir, "embeddings.parquet"))

    for table, keys in _TPCH_KEYS.items():
        t = load_table(spark, SF_DIR, table)
        _with_copies(t, factor, lambda df, c, keys=keys: [
            (F.col(col) + c * _KEY_SHIFT).alias(col) if col in keys
            else col
            for col in df.columns
        ]).repartition(32).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{table}.parquet"))

    for dim in ("nation", "region"):
        load_table(spark, SF_DIR, dim).write.mode("overwrite") \
            .parquet(os.path.join(out_dir, f"{dim}.parquet"))


def time_headline(spark, registry, sf_dir: str, canary,
                  n_iter: int = 2, max_iters: int = 5) -> dict[str, dict]:
    """1 cold + n_iter warm per query, plus bench.py's adaptive
    dispersion control (r11 — the tier's ngram/minhash n=2 medians
    swung ±30 % between rounds on unchanged plans): an EXPENSIVE
    (>2 s) and NOISY (>10 % warm spread) cell keeps sampling up to
    max_iters warm runs, so tier-over-tier comparisons of the heavy
    dedup entries rest on an honest median. ``canary`` (VERDICT r12
    #3, scale_common.Canary) is sampled at the tier start and every
    5 cells; each cell records its nearest preceding canary_t +
    load_factor, and — as in bench.py — a loaded machine disables
    the sub-2 s early exit so noisy-under-load cells keep sampling."""
    out: dict[str, dict] = {}
    canary.sample("tier_start")
    for idx, name in enumerate(HEADLINE):
        if idx and idx % 5 == 0:
            canary.sample(f"after_{idx}")
        q = registry[name]
        runs = []

        def one_run():
            t0 = time.perf_counter()
            q.spark(spark, sf_dir).write.format("noop") \
                .mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
            release_tracked()

        loaded = canary.loaded()
        for _ in range(1 + n_iter):
            one_run()
        while (len(runs) - 1) < max_iters:
            warm = runs[1:]
            med = statistics.median(warm)
            # trailing-3 stop rule, mirroring bench.py (ADVICE r11
            # low: full-set max-min is monotonically non-decreasing —
            # one outlier and the cell burned max_iters every time)
            tail = warm[-3:]
            if (max(tail) - min(tail)) <= 0.10 * med:
                break
            if med <= 2.0 and not loaded:
                break
            one_run()
        out[name] = {"cold": runs[0], "warm": runs[1:],
                     "median": round(statistics.median(runs[1:]), 3),
                     "canary_t": canary.samples[-1]["t"]}
    canary.sample("tier_end")
    return out


def main() -> None:
    factors = [int(a) for a in sys.argv[1:]] or [1, 10]
    spark = get_session("headline-scale")
    registry = all_queries()
    work = tempfile.mkdtemp(prefix="headline_scale_")
    results: dict[int, dict] = {}
    from scale_common import Canary
    canary = Canary(spark)
    tier_marks: dict[int, int] = {}
    try:
        for f in factors:
            d = SF_DIR if f == 1 else os.path.join(work, f"x{f}")
            if f != 1:
                t0 = time.perf_counter()
                materialize(spark, f, d)
                print(f"# materialized {f}x in "
                      f"{time.perf_counter() - t0:.1f}s -> {d}",
                      file=sys.stderr)
            tier_marks[f] = len(canary.samples)
            results[f] = time_headline(spark, registry, d, canary)
            total = sum(v["median"] for v in results[f].values())
            print(f"# factor {f}: headline total {total:.2f}s",
                  file=sys.stderr)
    finally:
        shutil.rmtree(work, ignore_errors=True)

    # per-cell load_factor against the RUN's best canary (bench.py's
    # post-processing rule): the record alone can now say "this tier
    # ran while the machine was Yx loaded" — VERDICT r12 #3
    cmin = min(s["t"] for s in canary.samples)
    for f in factors:
        for row in results[f].values():
            row["load_factor"] = round(row["canary_t"] / cmin, 3)

    base = results.get(1, {})
    report = {"sf_dir": SF_DIR, "factors": factors, "queries": {},
              "canary": canary.block(),
              "tier_canary_start": {str(f): i
                                    for f, i in tier_marks.items()}}
    for name in HEADLINE:
        row = {str(f): results[f][name]["median"] for f in factors}
        if 1 in results and base.get(name, {}).get("median"):
            for f in factors:
                if f != 1:
                    row[f"ratio_{f}x"] = round(
                        results[f][name]["median"]
                        / base[name]["median"], 2)
        for f in factors:
            row[f"load_{f}x"] = results[f][name]["load_factor"]
        report["queries"][name] = row
    for f in factors:
        report[f"total_{f}x"] = round(
            sum(results[f][n]["median"] for n in HEADLINE), 3)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
