"""Fifteenth registry batch (round 10): as-of breadth —

- nearest-click gap per day: every purchase matched to its temporally
  CLOSEST click (either direction) within a ±2h tolerance via the
  as-of operator's ``nearest`` mode — the union + keyed-window
  merge-join formulation, one shuffle, no candidate pairs. The
  DuckDB oracle is DEFINITIONAL (join every candidate, take the
  per-purchase minimum gap), so the hash match proves the windowed
  formulation against the O(n·m) ground truth. The reported metric
  is the summed |gap| — equidistant backward/forward ties contribute
  the same gap either way, so the oracle needs no tie-break mirror.

Same contract rules as plans/analytics.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .analytics import load_events

_NEAR_TOL_US = 2 * 3600 * 1_000_000  # ±2h


def nearest_click_gap(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.asof import asof_join

    ev = load_events(spark, sf)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts_us",
        F.expr("ts_sec DIV 86400").alias("day"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts_us").alias("cts"),
        F.col("ts_us").alias("click_ts"),
    )
    joined = asof_join(
        purchases,
        clicks,
        on=["user_id"],
        left_ts="ts_us",
        right_ts="cts",
        value_cols=["click_ts"],
        direction="nearest",
        tolerance=_NEAR_TOL_US,
    )
    gap = F.abs(F.col("ts_us") - F.col("click_ts"))
    return (
        joined.groupBy("day")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_purchases"),
            F.sum(F.col("click_ts").isNotNull().cast("int"))
            .cast("long")
            .alias("n_matched"),
            F.coalesce(F.sum(gap), F.lit(0)).cast("long").alias("sum_gap_us"),
        )
        .orderBy("day")
    )


NEAREST_CLICK_SQL = f"""
WITH p AS (
    SELECT event_id, user_id, epoch_us(ts) AS ts_us,
           CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day
    FROM events WHERE event_type = 'purchase'
), c AS (
    SELECT user_id, epoch_us(ts) AS cts FROM events
    WHERE event_type = 'click'
), best AS (
    SELECT p.event_id, MIN(abs(p.ts_us - c.cts)) AS gap
    FROM p JOIN c ON c.user_id = p.user_id
    WHERE abs(p.ts_us - c.cts) <= {_NEAR_TOL_US}
    GROUP BY p.event_id
)
SELECT p.day,
       CAST(COUNT(*) AS BIGINT) AS n_purchases,
       CAST(COUNT(b.gap) AS BIGINT) AS n_matched,
       CAST(COALESCE(SUM(b.gap), 0) AS BIGINT) AS sum_gap_us
FROM p LEFT JOIN best b ON b.event_id = p.event_id
GROUP BY p.day ORDER BY p.day
"""


EXT15_QUERIES = {
    "nearest_click_gap": (nearest_click_gap, NEAREST_CLICK_SQL),
}
