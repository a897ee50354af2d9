"""Deterministic Poisson bootstrap — uncertainty quantification for
aggregate estimates at corpus scale, with engine-portable
reproducibility.

The online/Poisson bootstrap (Chamandy et al., "Estimating
uncertainty for massive data streams", Google TR 2012; public
method) replaces with-replacement resampling by giving every row an
independent Poisson(1) weight per replicate — one scan computes ALL
replicates, no shuffling of the corpus into samples. This module
derives the weight DETERMINISTICALLY: u = 32-bit md5 prefix of
(key | replicate) scaled to [0,1), mapped through the exact
Poisson(1) CDF thresholds (quantized at k <= 8; P(k > 8) < 1.2e-7 —
the tail mass is documented, not hidden). Same hash-order primitive
as sampling.py, so the whole resampling plan is DuckDB-oracled and a
re-run reproduces the replicate estimates bit-for-bit — the property
np.random bootstraps can't give a distributed engine.

Scale shape: explode(B) + weighted decimal sums with map-side
combine; the replicate frame is B rows; the summary is one row.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: exact Poisson(1) CDF through k=8 — repr'd into BOTH engines'
#: expressions so the comparison literals are bit-identical
POISSON1_CDF = []
_cum = 0.0
for _k in range(9):
    _cum += math.exp(-1.0) / math.factorial(_k)
    POISSON1_CDF.append(_cum)

B_DEFAULT = 64


def uniform_from(key: Column, replicate: Column) -> Column:
    """u in [0,1): 32-bit md5 prefix of 'key|b' / 2^32 — the
    engine-portable uniform (cf. sampling.hash_key)."""
    h = F.md5(F.concat(key.cast("string"), F.lit("|"),
                       replicate.cast("string")).cast("binary"))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("double")
            / F.lit(4294967296.0))


def poisson_weight(u: Column) -> Column:
    """Quantized Poisson(1) inverse CDF: k such that
    CDF(k-1) <= u < CDF(k), capped at 9 for the residual tail."""
    expr = F.lit(9)
    for k in range(len(POISSON1_CDF) - 1, -1, -1):
        expr = F.when(u < F.lit(POISSON1_CDF[k]), F.lit(k)).otherwise(expr)
    return expr


def poisson_weight_sql(u_expr: str) -> str:
    """The identical inverse CDF as a SQL CASE (same repr'd literals,
    same comparison order)."""
    clauses = "".join(
        f"WHEN {u_expr} < {POISSON1_CDF[k]!r} THEN {k} "
        for k in range(len(POISSON1_CDF)))
    return f"CASE {clauses}ELSE 9 END"


def bootstrap_replicates(df: DataFrame, key_col: str, value_col: str,
                         b: int = B_DEFAULT) -> DataFrame:
    """Per-replicate totals: (rep, est) — est = sum(weight * value)
    accumulated in decimal (order-independent; the hash weights are
    row-deterministic so the whole frame is reproducible)."""
    rep = F.explode(F.sequence(F.lit(0), F.lit(b - 1))).alias("rep")
    w = poisson_weight(uniform_from(F.col(key_col), F.col("rep")))
    return (df.select(F.col(key_col), F.col(value_col), rep)
            .withColumn("w", w)
            .groupBy("rep")
            .agg(F.sum((F.col("w") * F.col(value_col))
                       .cast("decimal(30,10)"))
                 .cast("double").alias("est")))


def bootstrap_summary(reps: DataFrame) -> DataFrame:
    """(boot_mean, boot_se, n_replicates) from the replicate frame —
    decimal moment sums, double sqrt last (the repo's standard
    cross-engine float recipe)."""
    agg = reps.agg(
        F.count("*").alias("n"),
        F.sum(F.col("est").cast("decimal(30,10)")).cast("double")
        .alias("s1"),
        F.sum((F.col("est") * F.col("est")).cast("decimal(38,6)"))
        .cast("double").alias("s2"))
    n = F.col("n")
    mean = F.col("s1") / n
    var = F.greatest((F.col("s2") - F.col("s1") * F.col("s1") / n)
                     / (n - 1), F.lit(0.0))
    return agg.select(mean.alias("boot_mean"),
                      F.sqrt(var).alias("boot_se"),
                      n.cast("long").alias("n_replicates"))
