"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``movie_data_pipeline_spark``; this module is
just the registry adapter.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from movie_data_pipeline_spark.plans.analytics import QUERIES


def _hardened(builder: Callable[[SparkSession, str], DataFrame]):
    """Pin the session confs the plans assume, whatever session the
    driver hands us: UTC (temporal extraction and timestamp literals
    are session-timezone-dependent in Spark; the DuckDB oracle is
    tz-naive/UTC) and Arrow for the pandas-UDF boundary."""

    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
        return builder(spark, sf_dir)

    return wrapped


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the 4-way broadcast
    join + aggregate + deterministic top-k (reference Q2 shape)."""
    builder, _ = QUERIES["q2_top_regions"]
    return _hardened(builder)(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator family from SURVEY.md §2."""
    return {name: _hardened(builder) for name, (builder, _) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each query (omitted for
    non-SQL-expressible ops → driver records a rows-only check)."""
    return {
        name: sql for name, (_, sql) in QUERIES.items() if sql is not None
    }


def rotating_slots(round_no: int, k: int = 50) -> list[str]:
    """PROPOSAL to the driver (r11 VERDICT item 5): a deterministic
    rotating k-slot sample so every registry entry eventually gets
    driver-hash coverage instead of the same 50 frozen since round 4.

    Contract: slots 1-8 are fixed anchors (the reference-workload
    analogs + the two driver-enforced approximate-family gates — the
    rows a human reads first in every CORRECTNESS file); the remaining
    k-8 slots are a window over ALL other ORACLED entries in registry
    order, advanced by (k-8) each round, wrapping — so consecutive
    rounds are disjoint away from the anchors and the whole oracled
    registry is covered every ceil(pool/(k-8)) ≈ 5 rounds. Pure
    function of (round_no, live registry): reproducible after the
    fact, no state. The driver would call
    ``rotating_slots(N)`` and record those entries instead of
    ``list(queries())[:50]``; until it does, the at-HEAD-green
    ORACLE_r{N}.json invariant (tests/test_analytics_oracle.py) is the
    compensating control for the 174 never-driver-hashed entries.
    """
    anchors = [
        "q1_top_part", "q2_top_regions", "q3_top_segment",
        "q4_yearly_shipments", "pricing_summary",
        "supplier_volume_by_nation", "approx_suite_check",
        "cluster_check",
    ]
    pool = [
        name
        for name, (_, sql) in QUERIES.items()
        if sql is not None and name not in anchors
    ]
    take = k - len(anchors)
    start = (round_no * take) % len(pool)
    window = (pool + pool)[start : start + take]
    return anchors + window
