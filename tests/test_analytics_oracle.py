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


def test_oracle_artifact_at_head():
    """The committed ORACLE_r{N}.json (round-10 VERDICT item 2: a
    per-round audit trail for the registry entries past driver slot
    50) must exist, cover the live registry exactly (a registry change
    without a regenerated artifact fails here), and be all-green."""
    import json
    import re
    from pathlib import Path

    repo = Path(__file__).resolve().parent.parent
    artifacts = sorted(
        repo.glob("ORACLE_r*.json"),
        key=lambda p: int(re.search(r"r(\d+)", p.name).group(1)),
    )
    assert artifacts, "no committed ORACLE_r{N}.json artifact"
    data = json.loads(artifacts[-1].read_text())
    meta = data.pop("_meta")
    assert not meta["subset"], "artifact must be a full-registry run"
    assert list(data) == list(QUERIES), (
        "artifact keys diverge from the live registry — regenerate with "
        "`python tools/oracle_check.py --json ORACLE_r{N}.json`"
    )
    bad = {
        name: row
        for name, row in data.items()
        if row["err"] is not None
        or not (
            row.get("rows_only")
            or (row["rows_match"] and row["schema_match"] and row["hash_match"])
        )
    }
    assert not bad, f"non-green artifact rows: {sorted(bad)}"
    assert meta["pass"] == meta["run"] == len(QUERIES)


def test_rotating_slots_proposal():
    """The r12 rotation proposal (__spark_entry__.rotating_slots):
    deterministic, 50 unique oracled entries per round, anchors always
    present, and the full oracled registry covered within 5 rounds."""
    import importlib
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    entry = importlib.import_module("__spark_entry__")

    oracled = set(entry.oracle_sql())
    seen: set[str] = set()
    for n in range(7):
        slots = entry.rotating_slots(n)
        assert len(slots) == 50 and len(set(slots)) == 50
        assert set(slots) <= oracled
        assert slots[:4] == [
            "q1_top_part", "q2_top_regions", "q3_top_segment",
            "q4_yearly_shipments",
        ]
        assert slots == entry.rotating_slots(n)  # pure function
        seen |= set(slots)
    assert seen == oracled  # full coverage within ceil(pool/42) rounds


def test_driver_slot_invariants():
    """The driver records only the first 50 registry entries; those
    slots must stay exactly the curated list, every one oracled."""
    from movie_data_pipeline_spark.plans.analytics import _DRIVER_SLOTS, QUERIES

    first50 = list(QUERIES)[:50]
    assert len(_DRIVER_SLOTS) == 50
    assert first50 == _DRIVER_SLOTS
    missing_oracle = [n for n in first50 if QUERIES[n][1] is None]
    assert not missing_oracle, missing_oracle
