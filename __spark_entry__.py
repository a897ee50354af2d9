"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (latest mid-price quote per
currency pair — scan -> filter -> broadcast dim join -> derived mid ->
window top-1) on sf0.001. ``queries()`` / ``oracle_sql()`` expose every
implemented operator from SURVEY.md §2 with its DuckDB oracle.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from stockanalyses_downloader_spark.queries.reference_queries import (
        flagship_latest_mid,
    )
    return flagship_latest_mid(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from stockanalyses_downloader_spark.queries import all_queries
    return {name: q.spark for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    from stockanalyses_downloader_spark.queries import all_queries
    return {name: q.oracle for name, q in all_queries().items()
            if q.oracle is not None}
