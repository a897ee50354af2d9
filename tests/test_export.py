"""Training-data export shards + integrity manifest
(operators/export): determinism, verification, tamper detection."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from conftest import SF_SMALL
from stockanalyses_downloader_spark.operators import export
from stockanalyses_downloader_spark.sources.tables import load_table


def _docs(spark):
    d = load_table(spark, SF_SMALL, "documents")
    return d.withColumn("n_tokens",
                        F.size(F.split(F.trim(F.col("text")), r"\s+")))


def test_export_roundtrip_verifies(spark, tmp_path):
    """Export the curated corpus to 8 JSONL shards; verification from
    the written files matches the manifest on every shard; totals
    conserve rows and every line parses as JSON with the payload."""
    import json

    d = _docs(spark)
    path = str(tmp_path / "exp")
    export.export_training_shards(
        d, path, "doc_id", ["doc_id", "text", "lang"],
        n_shards=8, token_col="n_tokens")
    ver = export.verify_export(spark, path).collect()
    assert len(ver) == 8 and all(r["ok"] for r in ver)
    assert export.export_is_valid(spark, path)
    assert sum(r["n_rows"] for r in ver) == d.count()
    man = spark.read.parquet(f"{path}/manifest").collect()
    assert sum(r["n_tokens"] for r in man) > 0

    a_file = sorted(glob.glob(f"{path}/shards/shard=*/part-*"))[0]
    with open(a_file) as fh:
        row = json.loads(fh.readline())
    assert {"doc_id", "text", "lang"} <= set(row)


def test_export_is_deterministic(spark, tmp_path):
    """Two exports of the same frame produce identical manifests —
    shard membership is md5-keyed, not partitioning-dependent (the
    second export runs from a differently-partitioned frame)."""
    d = _docs(spark)
    p1, p2 = str(tmp_path / "e1"), str(tmp_path / "e2")
    export.export_training_shards(
        d, p1, "doc_id", ["doc_id", "text"], n_shards=4)
    export.export_training_shards(
        d.repartition(13), p2, "doc_id", ["doc_id", "text"], n_shards=4)
    m1 = {(r["shard"], r["n_rows"], r["checksum"]) for r in
          spark.read.parquet(f"{p1}/manifest").collect()}
    m2 = {(r["shard"], r["n_rows"], r["checksum"]) for r in
          spark.read.parquet(f"{p2}/manifest").collect()}
    assert m1 == m2


def test_export_verification_catches_tampering(spark, tmp_path):
    """Drop one line from one shard file: exactly that shard fails
    verification (row count AND checksum), the others stay ok; a
    same-length swapped line (count unchanged) still fails via the
    checksum."""
    d = _docs(spark).limit(100)
    path = str(tmp_path / "tamper")
    export.export_training_shards(
        d, path, "doc_id", ["doc_id", "text"], n_shards=4)
    victim = sorted(glob.glob(f"{path}/shards/shard=*/part-*"))[0]
    lines = open(victim).read().splitlines(keepends=True)
    # Hadoop's LOCAL filesystem keeps .crc sidecars that would catch
    # the tamper below at read time — delete them to simulate the
    # object-store reality (no client-side sidecar; integrity is the
    # manifest's job)
    import os as _os
    for crc in glob.glob(f"{path}/shards/shard=*/.*.crc"):
        _os.remove(crc)
    open(victim, "w").writelines(lines[1:])        # lose one line
    spark.catalog.refreshByPath(f"{path}/shards")  # drop stale
    # file-size cache (a real verifier runs in a fresh session)
    ver = {r["shard"]: r["ok"] for r in
           export.verify_export(spark, path).collect()}
    assert sum(1 for ok in ver.values() if not ok) == 1
    assert not export.export_is_valid(spark, path)

    # restore length but corrupt content
    open(victim, "w").writelines(
        [lines[0].replace('"', '!', 1)] + lines[1:])
    spark.catalog.refreshByPath(f"{path}/shards")
    ver2 = export.verify_export(spark, path).collect()
    bad = [r for r in ver2 if not r["ok"]]
    assert len(bad) == 1 and bad[0]["n_rows"] == bad[0]["file_rows"]


def test_export_empty_frame_yields_valid_empty_manifest(spark, tmp_path):
    """An empty input exports an empty (but readable) manifest and
    verify_export returns no failing shard rows — the degenerate
    case a nightly job hits on a quiet source."""
    d = _docs(spark).filter("doc_id < 0")
    path = str(tmp_path / "empty")
    export.export_training_shards(d, path, "doc_id", ["doc_id", "text"],
                                  n_shards=4)
    man = spark.read.parquet(f"{path}/manifest").collect()
    assert man == []
    # no shards written and none manifested -> vacuously valid is
    # WRONG for export_is_valid (it demands at least one verifying
    # shard); the explicit contract: empty corpus -> not valid,
    # caller decides
    assert not export.export_is_valid(spark, path)
