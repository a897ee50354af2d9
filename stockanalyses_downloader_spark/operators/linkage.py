"""Entity resolution / record linkage (training-data-pipeline tier,
round 5c): the same real-world entity listed N times under different
surface forms — catalog dedup before any per-entity aggregate is
trustworthy. The reference engine has no linkage surface (its dims are
keyed exactly, ``downloader/main.py`` resolves pairs by equality);
this is the fuzzy generalization the 100 TB corpus tier needs.

Fellegi-Sunter shape, expressed Spark-first:

1. **Block** — a cheap deterministic key (here: a name token) bounds
   the candidate self-join; without it the comparison space is n² in
   the table. Same contract as dedup.py's block_cols: exactness holds
   within blocks by construction, cross-block recall is the blocking
   key's job (compose multiple passes with different keys if needed).
2. **Compare** — field-level similarities, all in-plan (levenshtein /
   equality; no UDF): each candidate pair gets a weighted agreement
   score.
3. **Decide** — score >= threshold => match edge.
4. **Cluster** — transitive closure over match edges
   (graph.connected_components — one shuffle per round, lineage
   truncated), entity id = min member id; unmatched records stay
   their own entity.

Scale shape: the blocked self-join shuffles once on the block key;
scoring is whole-stage-codegen'd; the edge set entering CC is
match-sparse (far smaller than the candidate set); the final map-back
is one key join. No driver-side loops beyond CC's bounded rounds.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .graph import connected_components


def name_similarity(a: Column, b: Column) -> Column:
    """Normalized edit similarity: 1 - lev(a,b)/max(len) in [0,1] —
    engine-portable (DuckDB's levenshtein uses the same unit-cost
    edit distance)."""
    denom = F.greatest(F.length(a), F.length(b))
    return (F.when(denom > 0,
                   1.0 - F.levenshtein(a, b).cast("double") / denom)
            .otherwise(F.lit(1.0)))


def candidate_pairs(records: DataFrame, id_col: str, block_col: Column,
                    carry: Sequence[str]) -> DataFrame:
    """Blocked candidate pairs (id_a < id_b): each side carries the
    ``carry`` comparison fields suffixed _a/_b. The block key bounds
    the join; pairs never leave their block."""
    def side(suffix: str) -> DataFrame:
        cols = [F.col(id_col).alias(f"id{suffix}"),
                block_col.alias("blk")]
        cols += [F.col(c).alias(f"{c}{suffix}") for c in carry]
        return records.select(*cols)

    return (side("_a").join(side("_b"), "blk")
            .filter(F.col("id_a") < F.col("id_b")))


def resolve_entities(records: DataFrame, id_col: str,
                     block_col: Column, name_col: str,
                     agree_col: Optional[str] = None,
                     threshold: float = 0.8,
                     w_name: float = 0.7) -> DataFrame:
    """Cluster records into entities: score = w_name * name_sim +
    (1-w_name) * [agree_col equal], match iff score >= threshold,
    entity id = min id of the transitive match cluster. Exact-name +
    agreeing-attribute pairs score 1.0; exact-name pairs with a
    DISAGREEING attribute score w_name (below the default threshold
    — same surface form, different entity). Output: the input rows
    plus ``entity_id`` and ``is_canonical`` (the cluster minimum
    keeps the record-of-reference role, the dedup_keepers
    contract)."""
    assert threshold <= 1.0, "exact-form pairs score 1.0 and must match"
    carry = [name_col] + ([agree_col] if agree_col else [])
    # Exact-form collapse — the linkage scale shape: records sharing
    # the same (name, agree) surface form ALWAYS merge (sim 1.0 +
    # agreement 1.0 >= any threshold <= 1.0), so the pairwise stage
    # runs over DISTINCT forms and the comparison cost is
    # |surface forms|^2 per block, not |records|^2 (a catalog with
    # 320 listings per product name pays 1 comparison, not ~50k).
    # Each form's representative id is its min record id; transitive
    # closure over rep ids then maps back through one form join —
    # provably the same clusters/minima as record-level closure.
    forms = records.groupBy(*carry).agg(F.min(id_col).alias("__rep"))
    pairs = candidate_pairs(forms, "__rep", block_col, carry)
    sim = name_similarity(F.col(f"{name_col}_a"), F.col(f"{name_col}_b"))
    if agree_col:
        agree = (F.col(f"{agree_col}_a") == F.col(f"{agree_col}_b")
                 ).cast("double")
        score = F.lit(w_name) * sim + F.lit(1.0 - w_name) * agree
    else:
        score = sim
    edges = (pairs.filter(score >= threshold)
             .select("id_a", "id_b"))
    comp = connected_components(edges)
    form_entity = (forms.join(
        comp.withColumnRenamed("id", "__rep"), "__rep", "left")
        .withColumn("__entity", F.coalesce("component", F.col("__rep")))
        .select(*carry, "__entity"))
    # null-safe equi-join on the form columns (a NULL name is still a
    # form; plain equality would drop those records)
    cond = None
    for c in carry:
        eq = records[c].eqNullSafe(form_entity[c])
        cond = eq if cond is None else cond & eq
    out = (records.join(form_entity, cond)
           .drop(form_entity[carry[0]], *[form_entity[c]
                                          for c in carry[1:]]))
    return (out.withColumn("entity_id", F.col("__entity"))
            .withColumn("is_canonical", F.col(id_col) == F.col("__entity"))
            .drop("__entity"))
