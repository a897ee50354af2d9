"""Explicit schemas for every record shape in the engine.

The reference is fully schemaless (dict-key access sites only —
see reference main.py:277,301,444). This engine declares every shape as
a StructType and never relies on ``inferSchema`` in production paths,
so parquet scans get column pruning and filter pushdown, and streaming
sources have stable shapes across micro-batches.

Numeric ticker fields use DoubleType: the upstream REST APIs serialize
numerics as strings (reference bitstamp/client.py:40 consumes them
verbatim); the cast to double happens at the source boundary
(sources/ticker.py), never downstream.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- reference domain ------------------------------------------------------

#: one row per queue job (reference main.py:277-280,301)
JOB = T.StructType([
    T.StructField("downloader_jq_id", T.LongType(), False),
    T.StructField("action", T.IntegerType(), False),   # normalized to int
    T.StructField("value", T.StringType(), True),      # "<exchange>#<isin>"
    T.StructField("type_idtype", T.IntegerType(), True),
])

#: ISIN <-> currency pair dimension (reference currency.py:7-91)
CURRENCY_DIM = T.StructType([
    T.StructField("isin", T.StringType(), False),
    T.StructField("base", T.StringType(), False),
    T.StructField("quote", T.StringType(), False),
    T.StructField("pair", T.StringType(), False),
])

#: REST ticker snapshot after the source boundary cast
#: (union of Bitstamp v2 and Bitfinex v1 payload fields;
#: reference bitstamp/client.py:45-65, bitfinex/client.py:22-36)
TICKER_REST = T.StructType([
    T.StructField("exchange", T.StringType(), False),
    T.StructField("isin", T.StringType(), False),
    T.StructField("status", T.IntegerType(), False),
    T.StructField("last", T.DoubleType(), True),
    T.StructField("high", T.DoubleType(), True),
    T.StructField("low", T.DoubleType(), True),
    T.StructField("bid", T.DoubleType(), True),
    T.StructField("ask", T.DoubleType(), True),
    T.StructField("volume", T.DoubleType(), True),
    T.StructField("vwap", T.DoubleType(), True),   # bitstamp only
    T.StructField("open", T.DoubleType(), True),   # bitstamp only
    T.StructField("ts", T.TimestampType(), True),
])

#: raw WSS tick as delivered on the wire: positional array-of-arrays
#: plus epoch ts (reference main.py:398-415)
TICK_WSS_RAW = T.StructType([
    T.StructField("pair", T.StringType(), False),
    T.StructField("tick", T.ArrayType(T.ArrayType(T.DoubleType())), True),
    T.StructField("ts", T.DoubleType(), True),
])

#: WSS tick after positional projection (operators/pipeline.project_wss_tick)
TICK_WSS = T.StructType([
    T.StructField("pair", T.StringType(), False),
    T.StructField("bid", T.DoubleType(), True),
    T.StructField("ask", T.DoubleType(), True),
    T.StructField("daily_change", T.DoubleType(), True),
    T.StructField("daily_change_pct", T.DoubleType(), True),
    T.StructField("last_price", T.DoubleType(), True),
    T.StructField("volume", T.DoubleType(), True),
    T.StructField("high", T.DoubleType(), True),
    T.StructField("low", T.DoubleType(), True),
    T.StructField("ts", T.TimestampType(), True),
])

#: enriched output message (reference main.py:407-416 + :214-215)
MESSAGE = T.StructType(TICK_WSS.fields[1:] + [
    T.StructField("mid", T.DoubleType(), True),
    T.StructField("exchange", T.StringType(), False),
    T.StructField("isin", T.StringType(), False),
])

# --- driver test tables (/root/testdata/sf*/; see TESTDATA.md) --------------

EVENTS = T.StructType([
    T.StructField("event_id", T.LongType(), False),
    T.StructField("ts", T.TimestampType(), False),
    T.StructField("user_id", T.LongType(), False),
    T.StructField("event_type", T.StringType(), False),
    T.StructField("value", T.DoubleType(), False),
    T.StructField("props", T.StringType(), True),  # JSON string
])

DOCUMENTS = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("text", T.StringType(), True),
    T.StructField("lang", T.StringType(), True),
    T.StructField("source", T.StringType(), True),
    T.StructField("n_chars", T.LongType(), True),
])

EMBEDDINGS = T.StructType([
    T.StructField("vec_id", T.LongType(), False),
    T.StructField("embedding", T.ArrayType(T.FloatType()), True),
    T.StructField("label", T.IntegerType(), True),
])

#: multimodal asset table: opaque payload + typed metadata
#: (engine extension — binary column plumbing for image/audio/video)
MULTIMODAL_ASSET = T.StructType([
    T.StructField("asset_id", T.LongType(), False),
    T.StructField("modality", T.StringType(), False),   # image|audio|video
    T.StructField("payload", T.BinaryType(), True),
    T.StructField("meta", T.StructType([
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]), True),
])
