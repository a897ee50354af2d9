"""The local mirror of the driver's correctness gate: every queries()
entry runs; every oracle_sql() entry hash-matches at the test SF."""

from __future__ import annotations

import pytest

from stockanalyses_downloader_spark.queries import all_queries
from stockanalyses_downloader_spark.testing import assert_matches_oracle

_ALL = all_queries()


@pytest.mark.parametrize("name", sorted(_ALL))
def test_query_vs_oracle(spark, sf_dir, name):
    q = _ALL[name]
    df = q.spark(spark, sf_dir)
    if q.oracle is None:
        assert df.count() >= 0  # rows-only: must run and be materializable
    else:
        assert_matches_oracle(df, q.oracle, sf_dir)


def test_entry_smoke(spark):
    import __spark_entry__ as entrymod
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert set(entrymod.oracle_sql()) <= set(entrymod.queries())


def test_no_query_is_vacuously_empty(spark, sf_dir):
    """A query whose result AND oracle are both empty passes the hash
    compare without testing anything — pin non-emptiness so filters
    that match nothing (wrong literals, dead predicates) surface."""
    empties = [name for name, q in _ALL.items()
               if q.spark(spark, sf_dir).limit(1).count() == 0]
    assert not empties, f"vacuously empty queries: {empties}"
