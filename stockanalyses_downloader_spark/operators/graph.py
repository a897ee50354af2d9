"""Connected components over near-dup pair lists — the clustering /
keeper-selection step of a dedup pipeline (pairs alone don't dedup a
corpus; transitive groups do: A~B, B~C must collapse to ONE kept doc
even when A~C was never scored).

Implementation is min-label propagation, DataFrame-native:

  label(v) starts as v's own id; each round every vertex takes the
  min of its label and its neighbors' labels; fixpoint = every vertex
  labeled with the smallest id in its component.

Each round is one shuffle (edge join + min aggregate); rounds needed
= graph diameter, which for near-dup clusters is tiny (dup groups are
dense cliques-ish, diameter 1-3). The driver-side convergence check
(one count per round) is inherent to iterative algorithms on Spark —
the same structure GraphX/GraphFrames uses. At 100 TB with
adversarial long-chain graphs you'd switch to the large-star/
small-star algorithm (O(log n) rounds); for dedup workloads plain
propagation converges faster in wall clock.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(edges: DataFrame, src: str = "id_a",
                         dst: str = "id_b",
                         max_iter: int = 50) -> DataFrame:
    """Component id (= min member id) per vertex appearing in
    ``edges``. Isolated vertices don't appear (no edges -> no dup
    group -> caller keeps the doc as its own keeper).

    Returns (id, component)."""
    sym = (edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
           .unionByName(edges.select(F.col(dst).alias("a"),
                                     F.col(src).alias("b")))
           .distinct().persist())
    labels = (sym.select(F.col("a").alias("id")).distinct()
              .withColumn("component", F.col("id")).persist())
    for _ in range(max_iter):
        nbr_min = (sym.join(labels.withColumnRenamed("id", "b"), "b")
                   .groupBy("a")
                   .agg(F.min("component").alias("nbr_component")))
        new_labels = (labels.join(nbr_min,
                                  labels["id"] == nbr_min["a"], "left")
                      .select(labels["id"],
                              F.least(
                                  F.col("component"),
                                  F.coalesce("nbr_component", "component"))
                               .alias("component"))
                      .persist())
        changed = (new_labels.alias("n")
                   .join(labels.alias("o"), "id")
                   .filter(F.col("n.component") != F.col("o.component"))
                   .count())
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds")
    sym.unpersist()
    return labels


def dedup_keepers(docs: DataFrame, pair_edges: DataFrame,
                  id_col: str = "doc_id") -> DataFrame:
    """Keeper assignment: every doc mapped to the id that survives
    dedup — the component min for docs in a near-dup group, itself
    otherwise. Output: (id_col, keeper_id, is_kept)."""
    comp = connected_components(pair_edges).withColumnRenamed(
        "id", id_col)
    out = (docs.select(id_col)
           .join(comp, id_col, "left")
           .select(id_col,
                   F.coalesce("component", F.col(id_col))
                    .alias("keeper_id")))
    return out.withColumn("is_kept", F.col(id_col) == F.col("keeper_id"))
