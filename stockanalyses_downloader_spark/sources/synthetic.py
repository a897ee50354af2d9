"""Deterministic reference-domain feeds derived from the ``events`` table.

The reference's inputs are network feeds (job API, exchange REST/WSS).
For a testable engine those become *sources over data at rest*: the
driver's ``events`` table doubles as the tick stream and the job queue.
Each derivation exists twice — as DataFrame code (the engine path) and
as an ANSI-SQL relation string (the DuckDB oracle path) — built from the
same constants so the two are row-identical by construction.

Derivation map (events -> ticker):
    isin      <- user_id scattered over 1..97 (85..97 are unknown ISINs,
                 exercising the inner-join drop of reference currency.py:94)
    exchange  <- user_id parity -> 'btsp' | 'btfx' (main.py:282-286)
    bid/ask   <- value -/+ 0.1% (mid recovers ~value; main.py:414)
    status    <- mostly 200, every 97th event 500 (P2 filter, main.py:328)

Derivation map (events -> jobs):
    downloader_jq_id <- event_id, every 101st row 0 (sentinel, main.py:277)
    action           <- {1000,1000,1100,1300,1900} by event_id%5
    value            <- '<exchange>#<isin>' (main.py:278-280)
    type_idtype      <- 2, every 7th row 1 (REST guard, main.py:301)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .tables import load_table

N_ISIN_SPREAD = 97   # 84 known + 13 unknown ISINs
BAD_STATUS_EVERY = 97
ZERO_ID_EVERY = 101
NON_CRYPTO_EVERY = 7


def _isin_col(user_id: Column) -> Column:
    return F.concat(F.lit("XFC"),
                    F.lpad((user_id % N_ISIN_SPREAD + 1).cast("string"), 9, "0"))


def _exchange_col(user_id: Column) -> Column:
    return F.when(user_id % 2 == 0, F.lit("btsp")).otherwise(F.lit("btfx"))


ISIN_SQL = f"concat('XFC', lpad(CAST(user_id % {N_ISIN_SPREAD} + 1 AS VARCHAR), 9, '0'))"
EXCHANGE_SQL = "CASE WHEN user_id % 2 = 0 THEN 'btsp' ELSE 'btfx' END"


def ticks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ticker-snapshot feed: one pseudo-tick per event row."""
    ev = load_table(spark, sf_dir, "events")
    uid = F.col("user_id")
    return ev.select(
        F.col("event_id").alias("tick_id"),
        _exchange_col(uid).alias("exchange"),
        _isin_col(uid).alias("isin"),
        F.when(F.col("event_id") % BAD_STATUS_EVERY == 0, F.lit(500))
         .otherwise(F.lit(200)).cast("int").alias("status"),
        (F.col("value") * 0.999).alias("bid"),
        (F.col("value") * 1.001).alias("ask"),
        F.col("value").alias("last_price"),
        F.abs(F.col("value")).alias("volume"),
        F.col("ts"),
    )


TICKS_SQL = f"""(
  SELECT event_id AS tick_id,
         {EXCHANGE_SQL} AS exchange,
         {ISIN_SQL} AS isin,
         CAST(CASE WHEN event_id % {BAD_STATUS_EVERY} = 0 THEN 500 ELSE 200 END AS INT) AS status,
         value * 0.999 AS bid,
         value * 1.001 AS ask,
         value AS last_price,
         abs(value) AS volume,
         ts
  FROM events
)"""


def jobs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Job-queue feed matching schemas.JOB."""
    ev = load_table(spark, sf_dir, "events")
    uid, eid = F.col("user_id"), F.col("event_id")
    action = (
        F.when(eid % 5 == 2, 1100)
         .when(eid % 5 == 3, 1300)
         .when(eid % 5 == 4, 1900)
         .otherwise(1000)
    )
    return ev.select(
        F.when(eid % ZERO_ID_EVERY == 0, F.lit(0)).otherwise(eid)
         .cast("long").alias("downloader_jq_id"),
        action.cast("int").alias("action"),
        F.concat(_exchange_col(uid), F.lit("#"), _isin_col(uid)).alias("value"),
        F.when(eid % NON_CRYPTO_EVERY == 0, F.lit(1)).otherwise(F.lit(2))
         .cast("int").alias("type_idtype"),
    )


def wss_ticks_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wire-format WSS tick stream: positional array-of-arrays + epoch
    seconds, the shape drained from the reference's queue
    (main.py:398-415). Pair resolved through the broadcast dim."""
    from ..dims.currency import currency_dim

    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        F.col("event_id").alias("tick_id"),
        _isin_col(F.col("user_id")).alias("isin"),
        "value", "ts")
    v = F.col("value")
    return (base
            .join(F.broadcast(currency_dim(spark)), "isin", "inner")
            .select(
                "tick_id", "isin", "pair",
                F.array(F.array(
                    v * 0.999, F.lit(0.0), v * 1.001, F.lit(0.0),
                    v * 0.001, v * 0.0001, v, F.abs(v),
                    v * 1.002, v * 0.998)).alias("tick"),
                (F.unix_micros("ts") / F.lit(1000000.0)).alias("ts")))


JOBS_SQL = f"""(
  SELECT CAST(CASE WHEN event_id % {ZERO_ID_EVERY} = 0 THEN 0 ELSE event_id END AS BIGINT)
           AS downloader_jq_id,
         CAST(CASE WHEN event_id % 5 = 2 THEN 1100
                   WHEN event_id % 5 = 3 THEN 1300
                   WHEN event_id % 5 = 4 THEN 1900
                   ELSE 1000 END AS INT) AS action,
         concat({EXCHANGE_SQL}, '#', {ISIN_SQL}) AS value,
         CAST(CASE WHEN event_id % {NON_CRYPTO_EVERY} = 0 THEN 1 ELSE 2 END AS INT) AS type_idtype
  FROM events
)"""
