"""Entity resolution (operators/linkage): planted-truth clustering
semantics + the oracled catalog query's invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import SF_SMALL


def _resolve(spark, rows):
    from stockanalyses_downloader_spark.operators import linkage

    df = spark.createDataFrame(rows, "id long, name string, cat string")
    blk = F.element_at(F.split(F.col("name"), " "), -1)
    out = linkage.resolve_entities(df, "id", blk, "name",
                                   agree_col="cat",
                                   threshold=0.8, w_name=0.7)
    return {r["id"]: (r["entity_id"], r["is_canonical"])
            for r in out.collect()}


def test_linkage_planted_clusters(spark):
    """Typo variants of one listing cluster to the min id; the same
    surface name under a DISAGREEING category stays a separate
    entity; an unrelated name in the same block stays alone."""
    rows = [
        (1, "acme widget", "TOOL"),      # canonical
        (2, "acme widget", "TOOL"),      # exact dup -> joins 1
        (3, "acmee widget", "TOOL"),     # 1 edit in 12 chars -> joins 1
        (4, "acme widget", "FOOD"),      # same name, other category:
                                         # score 0.7 < 0.8 -> own entity
        (5, "zzzz widget", "TOOL"),      # same block, far name -> alone
    ]
    got = _resolve(spark, rows)
    assert got[1] == (1, True)
    assert got[2] == (1, False)
    assert got[3] == (1, False)
    assert got[4] == (4, True)
    assert got[5] == (5, True)


def test_linkage_transitive_closure(spark):
    """A~B and B~C merge all three even when A~C alone scores below
    threshold (the chain case the pairwise decision can't see)."""
    rows = [
        (10, "aaaa bolt", "TOOL"),
        (11, "aaab bolt", "TOOL"),   # 1 edit from 10 (sim 8/9 -> .92)
        (12, "aabb bolt", "TOOL"),   # 1 edit from 11, 2 edits from 10
    ]
    got = _resolve(spark, rows)
    assert {v[0] for v in got.values()} == {10}
    # direct 10~12 score: 0.7*(1-2/9)+0.3 = 0.844 >= .8 anyway; force
    # a genuinely sub-threshold far pair to prove the chain carries it
    rows.append((13, "abbb bolt", "TOOL"))  # 3 edits from 10: 0.766
    got = _resolve(spark, rows)
    assert got[13][0] == 10


def test_linkage_blocking_bounds_comparisons(spark):
    """Records in different blocks are never compared: identical
    names apart from the blocking noun stay separate entities."""
    rows = [
        (20, "acme widget", "TOOL"),
        (21, "acme gadget", "TOOL"),  # other block -> never scored
    ]
    got = _resolve(spark, rows)
    assert got[20][0] != got[21][0]


def test_part_entity_resolution_invariants(spark):
    """Catalog query on the real fixture: every part gets exactly one
    entity; each entity's canonical is its min member; duplicate
    (p_name, p_type) listings ALWAYS share an entity (exact-name +
    agreeing-type scores 1.0); and fuzzy merges actually occur
    (entities < distinct (name, type) pairs would be vacuous the
    other way: assert some entity spans >1 distinct name)."""
    from stockanalyses_downloader_spark.queries.relational_queries import (
        part_entity_resolution)

    rows = part_entity_resolution(spark, SF_SMALL).collect()
    assert len(rows) == len({r["p_partkey"] for r in rows})
    by_entity: dict = {}
    for r in rows:
        by_entity.setdefault(r["entity_id"], []).append(r)
    for eid, members in by_entity.items():
        assert eid == min(m["p_partkey"] for m in members)
        canon = [m for m in members if m["is_canonical"]]
        assert len(canon) == 1 and canon[0]["p_partkey"] == eid
    by_name_type: dict = {}
    for r in rows:
        by_name_type.setdefault((r["p_name"], r["p_type"]), set()).add(
            r["entity_id"])
    assert all(len(v) == 1 for v in by_name_type.values())
    assert any(len({m["p_name"] for m in ms}) > 1
               for ms in by_entity.values())


def test_linkage_null_name_records_survive(spark):
    """NULL-name records are a form too: they keep their rows (the
    null-safe map-back join) and resolve as their own entity (the
    block key is NULL -> never compared)."""
    from pyspark.sql import functions as F

    from stockanalyses_downloader_spark.operators import linkage

    df = spark.createDataFrame(
        [(1, "acme widget", "TOOL"), (2, None, "TOOL"), (3, None, "FOOD")],
        "id long, name string, cat string")
    blk = F.element_at(F.split(F.col("name"), " "), -1)
    out = linkage.resolve_entities(df, "id", blk, "name",
                                   agree_col="cat")
    got = {r["id"]: r["entity_id"] for r in out.collect()}
    assert got[1] == 1 and got[2] == 2 and got[3] == 3
    assert len(got) == 3
