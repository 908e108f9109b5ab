"""Cross-check every registry query against its DuckDB oracle at
sf0.001 — the in-repo twin of the driver's t2 correctness gate."""

from __future__ import annotations

import duckdb
import pytest

from movie_data_pipeline_spark.plans.analytics import QUERIES
from movie_data_pipeline_spark.schemas import TESTDATA_TABLES

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    yield con
    con.close()


def _normalize(rows, ndigits=9):
    out = []
    for row in rows:
        out.append(
            "|".join(
                repr(round(v, ndigits)) if isinstance(v, float) else repr(v)
                for v in row
            )
        )
    return sorted(out)


@pytest.mark.parametrize("name", list(QUERIES))
def test_oracle_match(spark, duck, name):
    builder, sql = QUERIES[name]
    sdf = builder(spark, SF)
    spark_rows = [tuple(r) for r in sdf.collect()]
    if sql is None:
        assert isinstance(spark_rows, list)  # rows-only check
        return
    res = duck.execute(sql)
    duck_cols = [d[0].lower() for d in res.description]
    duck_rows = res.fetchall()
    assert [c.lower() for c in sdf.columns] == duck_cols
    assert len(spark_rows) == len(duck_rows)
    assert _normalize(spark_rows) == _normalize(duck_rows)


def test_driver_slot_invariants():
    """The driver records only the first 50 registry entries; those
    slots must stay exactly the curated list, every one oracled."""
    from movie_data_pipeline_spark.plans.analytics import _DRIVER_SLOTS, QUERIES

    first50 = list(QUERIES)[:50]
    assert len(_DRIVER_SLOTS) == 50
    assert first50 == _DRIVER_SLOTS
    missing_oracle = [n for n in first50 if QUERIES[n][1] is None]
    assert not missing_oracle, missing_oracle
