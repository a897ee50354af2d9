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
