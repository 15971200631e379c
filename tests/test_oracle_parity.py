"""Every queries() entry with an oracle must match it exactly at sf0.001 —
the local mirror of the driver's CORRECTNESS gate (strict value equality,
stronger than the driver's hash)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.oracle_utils import assert_matches_oracle

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    assert_matches_oracle(df, ORACLES[name], sf_dir, name=name)


def test_all_oracle_keys_have_queries():
    missing = set(ORACLES) - set(QUERIES)
    assert not missing


def test_rows_only_queries_run(spark, sf_dir):
    """Queries without an oracle still must execute and return a schema."""
    for name in set(QUERIES) - set(ORACLES):
        df = QUERIES[name](spark, sf_dir)
        assert df.columns, name
        df.limit(5).collect()


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
