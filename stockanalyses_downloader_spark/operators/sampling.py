"""Deterministic sampling & split assignment — the reproducibility
primitives of a training-data pipeline (every corpus build needs "the
same 1% sample on every run/engine" and "this doc is ALWAYS train,
never val", or experiments contaminate).

The randomness source is an md5 prefix of the row key: uniform,
engine-portable (Spark and DuckDB produce identical lowercase hex for
identical input — pinned by the driver oracle), and stable under
repartitioning/reruns, unlike ``rand(seed)`` which is
partition-layout-dependent. Comparing the 8-hex-char prefix
LEXICOGRAPHICALLY equals comparing the 32-bit integer it encodes, so
thresholds are computed driver-side as hex strings and the whole
predicate stays a codegen'd string compare — no UDF, no conv().

Scale: every operator here is a linear scan (sample, split) or one
shuffle (stratified top-n per stratum); the hash is the partition-
independent part, so AQE/repartitioning never changes membership.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HEX_SPACE = 16 ** 8  # 8 hex chars = 32 bits of the md5


def hash_key(col: Column, salt: str = "") -> Column:
    """8-hex-char uniform hash of a key column (+ salt). Change the
    salt to draw an independent sample from the same corpus."""
    return F.substring(F.md5(F.concat(col.cast("string"), F.lit(salt))), 1, 8)


def _threshold_hex(p: float) -> str:
    return format(min(int(p * _HEX_SPACE), _HEX_SPACE - 1), "08x")


def deterministic_sample(df: DataFrame, rate: float, key: str,
                         salt: str = "") -> DataFrame:
    """Keep ~``rate`` of rows, membership decided per KEY, not per
    run: the same key is in or out forever, on any engine."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    return df.filter(hash_key(F.col(key), salt) < _threshold_hex(rate))


def assign_splits(df: DataFrame, key: str,
                  weights: dict[str, float] | None = None,
                  salt: str = "",
                  out_col: str = "split") -> DataFrame:
    """Disjoint, exhaustive, deterministic split assignment
    (train/val/test by default, 80/10/10). A key's split never
    changes unless the salt does — the leakage guard."""
    weights = weights or {"train": 0.8, "val": 0.1, "test": 0.1}
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"weights must sum to 1, got {total}")
    h = hash_key(F.col(key), salt)
    names = list(weights)
    cum = 0.0
    expr = None
    for name in names[:-1]:
        cum += weights[name]
        branch = h < _threshold_hex(cum)
        expr = (F.when(branch, name) if expr is None
                else expr.when(branch, name))
    expr = (expr.otherwise(names[-1]) if expr is not None
            else F.lit(names[-1]))
    return df.withColumn(out_col, expr)


def stratified_sample(df: DataFrame, stratum_col: str, n_per_stratum: int,
                      key: str, salt: str = "") -> DataFrame:
    """Deterministic top-``n`` rows per stratum, chosen by hash order
    (i.e. a uniform without-replacement sample per class whose
    membership is run- and engine-stable). One shuffle on the
    stratum; the per-stratum top-n runs as a window group limit."""
    from pyspark.sql import Window
    w = (Window.partitionBy(stratum_col)
         .orderBy(hash_key(F.col(key), salt), F.col(key)))
    return (df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= n_per_stratum)
            .drop("__rn"))
