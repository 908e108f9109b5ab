"""Fifteenth registry batch (round 10): as-of breadth and the last
TPC-H join-shape rung —

- nearest-click gap per day: every purchase matched to its temporally
  CLOSEST click (either direction) within a ±2h tolerance via the
  as-of operator's ``nearest`` mode — the union + keyed-window
  merge-join formulation, one shuffle, no candidate pairs. The
  DuckDB oracle is DEFINITIONAL (join every candidate, take the
  per-purchase minimum gap), so the hash match proves the windowed
  formulation against the O(n·m) ground truth. The reported metric
  is the summed |gap| — equidistant backward/forward ties contribute
  the same gap either way, so the oracle needs no tie-break mirror.

- TPC-H Q21's shape (suppliers who kept orders waiting), adapted to
  the driver schema (no receipt/commit dates): the sole-bottleneck
  supplier of each multi-supplier finished order. Q21 is the
  classic correlated-EXISTS + NOT-EXISTS double self-join of the
  fact table; the Spark side collapses all three correlated probes
  into ONE per-order aggregate (max shipdate, supplier count,
  suppliers-at-max count) joined back — one shuffle on the order
  key instead of three fact self-joins — and the oracle keeps the
  definitional EXISTS/NOT EXISTS formulation, so the hash match
  proves the aggregate rewrite.

Same contract rules as plans/analytics.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_table
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


def q21_bottleneck_suppliers(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q21's join shape on the driver schema: suppliers who were
    the SOLE slowest shipper of a multi-supplier finished order, with
    how many orders they bottlenecked. The classic formulation is a
    correlated scalar subquery (per-order max) + EXISTS (another
    supplier) + NOT EXISTS (another supplier also at max) — three
    fact self-joins. Here all three probes collapse into ONE
    per-order aggregate joined back: max shipdate, distinct-supplier
    count, and distinct-suppliers-at-max count (the last via a
    conditional distinct on a null-gated key). One shuffle on
    l_orderkey; supplier is a broadcast dim; the oracle keeps the
    definitional correlated formulation, so the hash match proves
    the rewrite."""
    li = load_table(spark, sf, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    fin = (
        load_table(spark, sf, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    # finished-order lines shuffle ONCE on the order key; the keyed
    # windows (whole-partition frame, bounded by per-order line
    # count) reuse that exact partitioning — no aggregate join-back,
    # no second pass over the fact (an earlier two-aggregate
    # formulation cost 8 exchanges and computed the at-max subtree
    # twice; this plan has one fact exchange + one tiny distinct)
    from pyspark.sql import Window

    lf = li.join(fin, li.l_orderkey == fin.o_orderkey).drop("o_orderkey")
    w = Window.partitionBy("l_orderkey")
    f1 = lf.select(
        "*",
        F.max("l_shipdate").over(w).alias("mx"),
        F.size(F.collect_set("l_suppkey").over(w)).alias("nsupp"),
    )
    f2 = f1.withColumn(
        "nmax",
        F.size(
            F.collect_set(
                F.when(
                    F.col("l_shipdate") == F.col("mx"), F.col("l_suppkey")
                )
            ).over(w)
        ),
    )
    qual = (
        f2.filter(
            (F.col("l_shipdate") == F.col("mx"))
            & (F.col("nsupp") >= 2)
            & (F.col("nmax") == 1)
        )
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    # supplier is SF-SCALED (not bounded-by-construction), so no
    # broadcast hint: AQE picks the build side at this SF and flips
    # to a shuffle join when the dim outgrows the threshold
    supp = load_table(spark, sf, "supplier").select("s_suppkey", "s_name")
    return (
        qual.join(supp, qual.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("long").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


Q21_SQL = """
WITH l AS (
    SELECT l_orderkey, l_suppkey, l_shipdate FROM lineitem
    WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                         WHERE o_orderstatus = 'F')
)
SELECT s_name, CAST(COUNT(DISTINCT l1.l_orderkey) AS BIGINT) AS numwait
FROM l l1
JOIN supplier ON s_suppkey = l1.l_suppkey
WHERE l1.l_shipdate = (SELECT max(l2.l_shipdate) FROM l l2
                       WHERE l2.l_orderkey = l1.l_orderkey)
  AND EXISTS (SELECT 1 FROM l l3
              WHERE l3.l_orderkey = l1.l_orderkey
                AND l3.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM l l4
                  WHERE l4.l_orderkey = l1.l_orderkey
                    AND l4.l_suppkey <> l1.l_suppkey
                    AND l4.l_shipdate = l1.l_shipdate)
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
"""


EXT15_QUERIES = {
    "nearest_click_gap": (nearest_click_gap, NEAREST_CLICK_SQL),
    "q21_bottleneck_suppliers": (q21_bottleneck_suppliers, Q21_SQL),
}
