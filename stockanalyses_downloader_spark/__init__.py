"""stockanalyses_downloader_spark — a PySpark-native analytics engine.

Re-expresses the capability surface of the reference microservice
``hack3d/stockanalyses-downloader`` (job-queue driven ticker ETL:
poll jobs, resolve ISIN -> currency pair through a dimension table,
fetch/stream ticker data, derive mid price, enrich, publish) as an
idiomatic Apache Spark engine — DataFrame/SQL-first, Catalyst-optimized,
Structured Streaming for the live path — plus the large-scale
training-data operators (dedup, similarity search, text analysis,
multimodal columns) such an engine needs at 100 TB.

Layout:
    session      SparkSession factory tuned for local test + cluster scale
    schemas      explicit StructTypes (never inferSchema in prod paths)
    config       file + env config precedence (reference: main.py:30-62)
    dims         static dimension tables (currency ISIN<->pair)
    sources      table loaders / ticker source interface
    operators    composable DataFrame -> DataFrame transforms
    streaming    streaming sources/sinks (foreachBatch patterns)
    plans        plan-audit helpers (pushdown / broadcast assertions)
"""

__version__ = "0.1.0"
