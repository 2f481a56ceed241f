"""The driver's correctness gate, in-repo: every catalog query with an
oracle must match DuckDB at sf0.001 (row count + columns + value
multiset). Rows-only queries must at least execute and return a stable
schema."""

from __future__ import annotations

import pytest

from tools.check_oracle import compare_query, duck_connect

from dynamodb_to_datalake_project_spark import catalog

catalog.load_all()
SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duck_connect(SF_DIR)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(catalog.QUERIES))
def test_query_matches_oracle(spark, duck, name):
    res = compare_query(
        spark, duck, name, catalog.QUERIES[name], catalog.ORACLE.get(name), SF_DIR
    )
    assert res["ok"], res.get("problems")


def test_entry_contract(spark):
    import __spark_entry__ as E

    df = E.entry(spark)
    assert df.count() > 0
    assert set(E.oracle_sql()) <= set(E.queries())
