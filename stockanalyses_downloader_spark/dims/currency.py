"""ISIN <-> currency-pair dimension.

The reference ships this as an in-memory dict of 84 entries keyed by
sequential ISINs ``XFC000000001..XFC000000084`` (currency.py:7-91) with
O(1) forward lookup (currency.py:93-94) and an O(n) linear scan for the
reverse pair->ISIN lookup (currency.py:96-99).

Here the same 84 facts are data, not code: a base/quote list expanded
into a tiny DataFrame. Both lookup directions become **broadcast hash
joins** (the dim is ~4 KB — at 100 TB fact scale this is the textbook
broadcast dimension; no shuffle in either direction).

``currency_values_sql`` renders the identical rows as an inline SQL
``VALUES`` relation so the DuckDB correctness oracle joins against
byte-identical dimension data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..schemas import CURRENCY_DIM

# the 84 base/quote pairs of the reference dim (currency.py:7-91), in
# ISIN order: XFC000000001 is _PAIRS[0], XFC000000084 is _PAIRS[83].
_PAIRS = (
    "btc/eur btc/usd ltc/usd ltc/btc eth/usd eth/btc etc/btc etc/usd "
    "rrt/usd rrt/btc zec/usd zec/btc xmr/usd xmr/btc dsh/usd dsh/btc "
    "xrp/usd xrp/btc iot/usd iot/btc iot/eth eos/usd eos/btc eos/eth "
    "san/usd san/btc san/eth omg/usd omg/btc omg/eth bch/usd bch/btc "
    "bch/eth neo/usd neo/btc neo/eth etp/usd etp/btc etp/eth qtm/usd "
    "qtm/btc qtm/eth avt/usd avt/btc avt/eth edo/usd edo/btc edo/eth "
    "btg/usd btg/btc dat/usd dat/btc dat/eth qsh/usd qsh/btc qsh/eth "
    "yyw/usd yyw/btc yyw/eth gnt/usd gnt/btc gnt/eth snt/usd snt/btc "
    "snt/eth iot/eur bat/usd bat/btc bat/eth mna/usd mna/btc mna/eth "
    "fun/usd fun/btc fun/eth zrx/usd zrx/btc zrx/eth tnb/usd tnb/btc "
    "tnb/eth spk/usd spk/btc spk/eth"
).split()


def currency_rows() -> list[tuple[str, str, str, str]]:
    rows = []
    for i, bq in enumerate(_PAIRS, start=1):
        base, quote = bq.split("/")
        rows.append((f"XFC{i:09d}", base, quote, base + quote))
    return rows


def currency_dim(spark: SparkSession) -> DataFrame:
    """The dimension as a DataFrame; join it with F.broadcast()."""
    return spark.createDataFrame(currency_rows(), schema=CURRENCY_DIM)


def currency_values_sql() -> str:
    """Inline VALUES relation (columns: isin, base, quote, pair) for the
    DuckDB oracle — identical rows to :func:`currency_dim`."""
    rows = ", ".join(
        f"('{isin}', '{b}', '{q}', '{p}')" for isin, b, q, p in currency_rows()
    )
    return (f"(SELECT * FROM (VALUES {rows}) "
            f"AS currency_dim(isin, base, quote, pair))")
