"""Query registry: every operator's ``queries()`` entry + DuckDB oracle.

Each submodule contributes a ``QUERIES: dict[str, Q]`` mapping; the
driver contract (``__spark_entry__.py``) flattens them. ``Q.oracle`` is
``None`` for operators that genuinely aren't ANSI-SQL-expressible
(LSH, streaming state) — the driver then records a rows-only check.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Q:
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str] = None


def all_queries() -> dict[str, Q]:
    from . import (reference_queries, relational_queries,
                   similarity_queries, text_queries)
    merged: dict[str, Q] = {}
    for mod in (reference_queries, relational_queries,
                text_queries, similarity_queries):
        overlap = merged.keys() & mod.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        merged.update(mod.QUERIES)
    return merged
