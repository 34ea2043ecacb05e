"""Every registered query with a DuckDB oracle is compared at sf0.001
(the driver does the same at sf0.01 — CORRECTNESS_r{N}.json)."""

import pytest

import __spark_entry__ as e
from oracle_harness import compare, duck_con
from remotior_sensus_spark.queries import GEO01

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con(geo001_dir):
    return duck_con(SF_DIR)


ORACLE_NAMES = sorted(e.oracle_sql().keys())
ROWS_ONLY = sorted(set(e.queries().keys()) - set(ORACLE_NAMES))


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_query(spark, con, name, geo001_dir):
    from remotior_sensus_spark.queries import ORACLE_BUILDERS
    if name in ORACLE_BUILDERS:
        sql = ORACLE_BUILDERS[name](geo001_dir)
    else:
        sql = e.oracle_sql()[name].replace(GEO01, geo001_dir)
    sdf = e.queries()[name](spark, SF_DIR).toPandas()
    ddf = con.sql(sql).df()
    ok, msg = compare(sdf, ddf)
    assert ok, f"{name}: {msg}"


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_query(spark, name, geo001_dir):
    sdf = e.queries()[name](spark, SF_DIR)
    assert sdf.count() >= 0  # runs + stable schema
    assert len(sdf.schema.fields) > 0


def test_entry_smoke(spark):
    df = e.entry(spark)
    assert df.count() > 0
