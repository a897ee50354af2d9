"""Trained character-n-gram Naive Bayes language ID — the learned
upgrade of the stopword-marker heuristic (`doc_language_scores`):
fastText-style langid reduced to its distributable core. The
reference engine has no language surface; this belongs to the corpus
curation tier (routing, per-language mixtures, decontamination
scopes all key on a language decision trusted ABOVE the heuristic's
marker coverage).

Training is one explode + two aggregates (per-(label, gram) counts,
per-label totals) with add-alpha smoothing — the model is a
(label, gram, logp) table plus per-label priors and an unseen-gram
penalty, all broadcast-sized (labels x seen-gram vocabulary).
Scoring is a gram-keyed join + per-(doc, label) sum — map-side
combined, no UDFs (F.log is JVM-side). Rows-only verification tier:
ln's last ulp is libm-specific, so this is pinned against a
pure-Python NB (1e-9) and an accuracy floor on the held-out split
rather than a DuckDB hash.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import spread

NB_N = 3          # character n-gram order
NB_ALPHA = 1.0    # add-alpha smoothing


def train_nb(docs: DataFrame, text_col: str = "text",
             label_col: str = "lang", n: int = NB_N,
             alpha: float = NB_ALPHA) -> tuple[DataFrame, DataFrame]:
    """Fit the model. Returns (gram_logps, label_stats):
    gram_logps = (label, gram, logp); label_stats = (label,
    log_prior, log_unseen) where log_unseen is the smoothed
    probability mass of a gram never seen with that label — the
    constant every out-of-model gram contributes at scoring time.

    spread() on the gram explode (r11 rollout): the char-n-gram
    expression is per-row CPU over the whole corpus; a narrow
    upstream would serialize it. The doc-count aggregates below scan
    the unspread docs (column-pruned, no per-row text work)."""
    g = (spread(docs).select(F.col(label_col).alias("label"),
                     F.explode(char_grams_col(F.col(text_col), n))
                     .alias("gram")))
    counts = g.groupBy("label", "gram").agg(F.count("*").alias("c"))
    totals = counts.groupBy("label").agg(F.sum("c").alias("total"))
    vocab = counts.select("gram").distinct().agg(
        F.count("*").alias("v"))
    lab_counts = (docs.groupBy(F.col(label_col).alias("label"))
                  .agg(F.count("*").alias("nd")))
    tot = lab_counts.agg(F.sum("nd").alias("ndocs"))
    priors = (lab_counts.crossJoin(F.broadcast(tot))
              .select("label",
                      F.log(F.col("nd") / F.col("ndocs"))
                      .alias("log_prior")))
    stats = (totals.crossJoin(F.broadcast(vocab))
             .join(priors, "label")
             .select("label", "total", "v", "log_prior",
                     F.log(F.lit(alpha)
                           / (F.col("total") + F.lit(alpha) * F.col("v")))
                     .alias("log_unseen")))
    logps = (counts.join(F.broadcast(stats.select("label", "total", "v")),
                         "label")
             .select("label", "gram",
                     F.log((F.col("c") + F.lit(alpha))
                           / (F.col("total") + F.lit(alpha) * F.col("v")))
                     .alias("logp")))
    return logps, stats.select("label", "log_prior", "log_unseen")


def char_grams_col(text: Column, n: int = NB_N) -> Column:
    """char_grams as a single in-plan expression built on the Column
    API (transform over a sequence of start offsets; F.substring
    accepts Column positions in Spark 4)."""
    c = F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))
    ln = F.length(c)
    return F.when(ln >= n,
                  F.transform(F.sequence(F.lit(1), ln - (n - 1)),
                              lambda i: F.substring(c, i, F.lit(n)))
                  ).otherwise(
        F.array().cast("array<string>"))


def score_nb(docs: DataFrame, gram_logps: DataFrame,
             label_stats: DataFrame, id_col: str = "doc_id",
             text_col: str = "text", n: int = NB_N) -> DataFrame:
    """Per-doc argmax label. Each doc gram joins the model (gram ->
    one row per label that has seen it); grams unseen by a label
    contribute that label's log_unseen. score(label) = log_prior +
    sum(seen logps) + (n_grams - n_seen(label)) * log_unseen.
    Deterministic argmax tie-break on label order. Output: (id_col,
    predicted_lang, best_logp)."""
    # spread() on the scoring explode (r11): same rationale as
    # train_nb — the n-gram expression dominates; the id-only
    # projection for the left join below stays unspread
    g = (spread(docs).select(id_col,
                             F.explode(char_grams_col(F.col(text_col), n))
                             .alias("gram")))
    # left join from docs so gramless documents (normalized text
    # shorter than n chars) still get a prior-only argmax row instead
    # of silently vanishing from the output
    per_doc = (docs.select(id_col)
               .join(g.groupBy(id_col).agg(F.count("*").alias("n_grams")),
                     id_col, "left")
               .select(id_col,
                       F.coalesce("n_grams", F.lit(0)).alias("n_grams")))
    seen = (g.join(F.broadcast(gram_logps), "gram")
            .groupBy(id_col, "label")
            .agg(F.sum("logp").alias("sum_logp"),
                 F.count("*").alias("n_seen")))
    # Map-only argmax (r10, the nearest_centroid pattern — VERDICT r9
    # #3): the old form crossJoined a |labels|× copy of every doc row
    # and window-ranked it back to one — a |labels|×-corpus exchange.
    # Now the per-doc seen rows collapse to ONE array row, the label
    # table rides in as a broadcast array, and a per-row fold scores
    # every label and keeps the (score desc, label asc) maximum —
    # identical comparator to the window's orderBy on identical float
    # values (same sums, same expression), no row blowup, no window.
    seen_arr = (seen.groupBy(id_col)
                .agg(F.collect_list(F.struct("label", "sum_logp",
                                             "n_seen")).alias("__seen")))
    larr = label_stats.agg(F.collect_list(
        F.struct("label", "log_prior", "log_unseen")).alias("__labels"))
    empty = F.array().cast(
        "array<struct<label:string,sum_logp:double,n_seen:bigint>>")
    sarr = F.coalesce(F.col("__seen"), empty)

    def _score(c):
        hit = F.get(F.filter(sarr, lambda e: e["label"] == c["label"]), 0)
        return F.struct(
            (c["log_prior"] + F.coalesce(hit["sum_logp"], F.lit(0.0))
             + (F.col("n_grams") - F.coalesce(hit["n_seen"], F.lit(0)))
             * c["log_unseen"]).alias("score"),
            c["label"].alias("label"))

    scored = F.transform(F.col("__labels"), _score)
    best = F.aggregate(
        scored, F.element_at(scored, 1),
        lambda acc, x: F.when(
            (x["score"] > acc["score"])
            | ((x["score"] == acc["score"])
               & (x["label"] < acc["label"])), x).otherwise(acc))
    return (per_doc.join(seen_arr, id_col, "left")
            .crossJoin(F.broadcast(larr))
            .select(id_col, best["label"].alias("predicted_lang"),
                    best["score"].alias("best_logp")))
