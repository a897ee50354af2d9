"""Shared scale-harness blow-up recipes.

One definition of the DISJOINT-block document blow-up (the headline
tier's axis): per-copy word tag so shingle/minhash/jaccard
vocabularies are disjoint across copies, per-copy source suffix so
the (lang, source) dedup blocks are disjoint too — data volume grows,
per-key/per-block density and dup structure stay constant. Used by
bench_headline_scale (materialized tiers), bench_ngram_spill and
bench_spread_guard, so their curves stay comparable by construction
(a recipe tweak in one tool can no longer silently diverge from the
others)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DOC_KEY_SHIFT = 10_000_000


def blow_up_docs(docs: DataFrame, factor: int) -> DataFrame:
    """docs UNION (factor-1) disjoint copies (see module docstring)."""
    if factor <= 1:
        return docs
    c = F.col("__c")
    tagged = F.concat_ws(
        " ",
        F.transform(F.split("text", r"\s+"),
                    lambda w: F.concat(F.lit("q"), c.cast("string"),
                                       F.lit("x"), w)))
    copies = (docs.crossJoin(F.broadcast(
                  docs.sparkSession.range(1, factor)
                  .select(F.col("id").alias("__c"))))
              .select((F.col("doc_id") + c * DOC_KEY_SHIFT)
                      .alias("doc_id"),
                      tagged.alias("text"), "lang",
                      F.concat(F.col("source"), F.lit("_"),
                               c.cast("string")).alias("source"),
                      F.length(tagged).alias("n_chars")))
    return docs.unionByName(copies)


# --- load canary for the scale tools (VERDICT r12 #3) -----------------------
#
# bench.py got the canary contract in r12 (per-cell canary_t +
# load_factor + an archived idle reference, making driver records
# self-adjudicating); the scale tools did not — exactly the ambiguity
# that burned the r11 100x record (122.42 s needing an in-round re-run
# to call it load). This class ports the same cell and the same
# archived-minimum reference so SCALE_HEADLINE_r*.json / curve runs
# carry their own adjudication rows.

import os as _os
import sys as _sys

_REPO = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _REPO not in _sys.path:
    _sys.path.insert(0, _REPO)


class Canary:
    """Run-scoped load canary: the SAME fixed cell, plausibility rule
    and loaded threshold as bench.py (imported, not copied — one
    definition of 'loaded' across every harness)."""

    def __init__(self, spark):
        from bench import _canary, _canary_ref, _historical_canary_min
        self._spark = spark
        self._cell = _canary
        self._ref = _canary_ref
        self.hist_min = _historical_canary_min(_REPO)
        _canary(spark)                # untimed codegen warm-up
        self.samples: list[dict] = []

    def sample(self, label) -> dict:
        row = {**self._cell(self._spark), "at": label}
        self.samples.append(row)
        return row

    def loaded(self) -> bool:
        """Is the LATEST sample >15 % above the idle reference (run
        minimum, or the archived minimum when plausibly same-machine)?"""
        cmin = min(s["t"] for s in self.samples)
        return self.samples[-1]["t"] > 1.15 * self._ref(cmin,
                                                        self.hist_min)

    def load_factor(self) -> float:
        """Latest sample over the run's best — the per-cell record."""
        cmin = min(s["t"] for s in self.samples)
        return round(self.samples[-1]["t"] / cmin, 3)

    def block(self) -> dict:
        """The record block — same shape as bench.py's sidecar."""
        ts = [s["t"] for s in self.samples]
        cmin, cmax = min(ts), max(ts)
        return {
            "cell": "spark.range(1<<22).sum -> noop, median of 3",
            "samples": self.samples,
            "min": cmin, "max": cmax,
            "spread_ratio": round(cmax / cmin, 3),
            "hist_min": self.hist_min,
            "hist_min_applied": bool(self.hist_min is not None
                                     and cmin <= 1.5 * self.hist_min),
        }
