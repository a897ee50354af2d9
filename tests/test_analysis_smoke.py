"""Whole-registry ANALYSIS smoke (VERDICT r2 #4).

Round 2 lost its entire bench to one AnalysisException
(TIMESTAMP_NTZ) that only surfaced when queries were EXECUTED.
Analysis is cheap: building every registry entry's plan and forcing
resolution (``df.schema``) catches type/resolution breakage across
all ~84 queries in seconds, without running a single job for the
lazily-constructed ones. Any environment shift that changes inferred
source types (the NTZ incident's shape) goes red here first.
"""

from __future__ import annotations

from conftest import SF_SMALL

from stockanalyses_downloader_spark.queries import all_queries

_ALL = all_queries()


def test_every_registry_entry_analyzes(spark):
    # r14 (VERDICT r13 #2): analysis of independent plans is
    # JVM-side and thread-safe — overlap it (guide §2.6) instead of
    # resolving 190 plans one at a time. Same coverage, failures
    # still reported per name. 197 s -> ~45 s.
    from concurrent.futures import ThreadPoolExecutor

    def one(item):
        name, q = item
        try:
            df = q.spark(spark, SF_SMALL)
            _ = df.schema  # forces full analysis/resolution, no execution
        except Exception as exc:  # noqa: BLE001
            return name, (f"{type(exc).__name__}: "
                          f"{str(exc).splitlines()[0][:200]}")
        return None

    with ThreadPoolExecutor(max_workers=6) as pool:
        failures = dict(f for f in pool.map(one, sorted(_ALL.items()))
                        if f)
    assert not failures, f"{len(failures)} queries fail analysis: {failures}"


def test_streaming_sources_analyze(spark, tmp_path):
    """Same guard for the streaming layer, which the registry doesn't
    cover: event-time ops reject TIMESTAMP_NTZ, so build a watermarked
    plan from each simulated source and force analysis."""
    from stockanalyses_downloader_spark.streaming.sources import (
        decode_kafka_ticks, file_tick_stream, kafka_tick_stream,
        rate_tick_stream)

    d = str(tmp_path)
    streams = {
        "file": file_tick_stream(spark, d),
        "kafka": decode_kafka_ticks(kafka_tick_stream(spark, d)),
        "rate": rate_tick_stream(spark),
    }
    failures: dict[str, str] = {}
    for name, s in streams.items():
        try:
            if dict(s.dtypes)["ts"] != "timestamp":
                # file/kafka carry the raw wire double-epoch ts;
                # event-time needs a real timestamp first
                import pyspark.sql.functions as F
                s = s.withColumn("ts", F.timestamp_seconds("ts"))
            _ = s.withWatermark("ts", "10 minutes").schema
        except Exception as exc:  # noqa: BLE001
            failures[name] = f"{type(exc).__name__}: {str(exc).splitlines()[0][:200]}"
    assert not failures, f"streaming analysis failures: {failures}"


def test_hash_embeddings_recover_exact_duplicates(spark, tmp_path):
    """Cross-tier integration: documents with identical TOKEN
    SEQUENCES get identical hashing-trick vectors (cosine exactly
    1), so the model-free text->vector bridge plugs straight into
    the dedup/ANN tier. The fixture corpus has no exact dups at
    sf0.001, so the dup structure is PLANTED into a temp sf_dir the
    query reads like any other (same loader path)."""
    from pyspark.sql import functions as F

    from stockanalyses_downloader_spark.queries.text_queries import (
        doc_hash_embeddings)

    rows = [
        (1, "spark table scan merge", "en", "s0"),
        (2, "spark  table   scan merge ", "en", "s1"),  # ws-normal dup of 1
        (3, "query window hash join filter", "en", "s0"),
        (4, "query window hash join filter", "fr", "s2"),  # dup of 3
        (5, "completely different tokens here", "en", "s0"),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string")         .withColumn("n_chars", F.length("text"))
    sf_dir = str(tmp_path)
    docs.coalesce(1).write.parquet(f"{sf_dir}/documents.parquet")

    emb = doc_hash_embeddings(spark, sf_dir)
    vecs: dict = {}
    for r in emb.collect():
        vecs.setdefault(r["doc_id"], {})[r["dim"]] = r["weight"]

    def cos(a, b):
        return sum(a.get(k, 0.0) * v for k, v in b.items())

    assert abs(cos(vecs[1], vecs[2]) - 1.0) < 1e-12
    assert abs(cos(vecs[3], vecs[4]) - 1.0) < 1e-12
    assert cos(vecs[1], vecs[5]) < 0.999
    assert cos(vecs[3], vecs[5]) < 0.999
