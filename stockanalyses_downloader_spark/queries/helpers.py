"""Cross-engine determinism helpers.

Float sums are order-dependent; a Spark partial-aggregate tree and
DuckDB's sequential scan would disagree in the last bits and fail the
driver's value-hash compare. The fix is exactness, not tolerance:
multiply in double (IEEE-identical in both engines), sum in DECIMAL
(exact, order-independent), cast the final value to double (identical
rounding). These helpers encode that recipe for both dialects.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_DEC = "decimal(30,10)"
_DEC_SQL = "DECIMAL(30,10)"


def dsum(col: Column) -> Column:
    """Order-independent double sum (exact decimal accumulation)."""
    return F.sum(col.cast(_DEC)).cast("double")


def dsum_sql(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS {_DEC_SQL})) AS DOUBLE)"


def davg(col: Column) -> Column:
    """Order-independent double mean: exact sum / exact count."""
    return dsum(col) / F.count(col)


def davg_sql(expr: str) -> str:
    return f"({dsum_sql(expr)} / COUNT({expr}))"
