"""Timeseries operator families the reference lacks (SURVEY §2.3/§2.9
note no as-of/range joins or calendar operations anywhere in its
workload) but a time-series store provides natively: hypertable-style
rollup with gap filling + last-observation-carried-forward, and
interval (range) joins.

Spark-first scale notes:

- Gap fill generates the missing buckets with ``sequence``/``explode``
  per group — one shuffle for the rollup, one window pass for LOCF; no
  driver-side calendar loop. Bucket count is bounded by the observed
  per-group time range, so the explode is output-sized, not data-sized.
- The range join blocks on a coarse time bucket (week) instead of a
  cartesian BroadcastNestedLoopJoin: intervals explode into the ≤6
  buckets they overlap, the probe side carries its single bucket, and
  the join is a plain shuffled equi-join on the bucket key followed by
  the exact range filter. Replication factor = interval_len/bucket_len
  + 1 (bounded), candidate set = per-bucket pairs (pruned), which is
  the standard scalable formulation at 100 TB — never an unbounded
  nested-loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from .analytics import _dec_sum, load_events

_US_PER_DAY = 86_400_000_000


def events_gapfill_locf(spark: SparkSession, sf: str) -> DataFrame:
    """Daily average event value per type, gap-filled over each type's
    observed [min_day, max_day] range, with LOCF: days with no events
    appear with observed=false and the last observed daily average
    carried forward. Averages go through exact DECIMAL sums (module
    determinism rules) and `+ 0.0` normalizes IEEE negative zero."""
    ev = load_events(spark, sf).select(
        F.expr(f"ts_us DIV {_US_PER_DAY}").alias("day_idx"),
        "event_type",
        "value",
    )
    daily = ev.groupBy("event_type", "day_idx").agg(
        (
            F.round(
                _dec_sum(F.col("value"), 6).cast("double") / F.count("value"), 2
            )
            + 0.0
        ).alias("day_avg")
    )
    cal = (
        daily.groupBy("event_type")
        .agg(F.min("day_idx").alias("lo"), F.max("day_idx").alias("hi"))
        .select(
            "event_type",
            F.explode(F.sequence("lo", "hi")).alias("day_idx"),
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day_idx")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        cal.join(daily, ["event_type", "day_idx"], "left")
        .select(
            "event_type",
            "day_idx",
            F.col("day_avg").isNotNull().alias("observed"),
            (F.last("day_avg", ignorenulls=True).over(w) + 0.0).alias(
                "value_locf"
            ),
        )
        .orderBy("event_type", "day_idx")
    )


EVENTS_GAPFILL_SQL = """
WITH daily AS (
  SELECT event_type,
         CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day_idx,
         ROUND(CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE)
               / COUNT(value), 2) + 0.0 AS day_avg
  FROM events
  GROUP BY 1, 2
),
cal AS (
  SELECT event_type, unnest(range(lo, hi + 1)) AS day_idx
  FROM (SELECT event_type, MIN(day_idx) AS lo, MAX(day_idx) AS hi
        FROM daily GROUP BY 1)
)
SELECT c.event_type, c.day_idx,
       d.day_avg IS NOT NULL AS observed,
       last_value(d.day_avg IGNORE NULLS)
         OVER (PARTITION BY c.event_type ORDER BY c.day_idx
               ROWS UNBOUNDED PRECEDING) + 0.0 AS value_locf
FROM cal c LEFT JOIN daily d
  ON c.event_type = d.event_type AND c.day_idx = d.day_idx
ORDER BY c.event_type, c.day_idx
"""


def order_window_shipments(spark: SparkSession, sf: str) -> DataFrame:
    """Interval join: for each of the 50 highest-value orders, count
    every lineitem (corpus-wide) shipped inside the order's 30-day
    window [o_orderdate, o_orderdate + 30d). Week-bucket blocking turns
    the range predicate into an equi-join: each order interval explodes
    into the ≤6 week buckets it overlaps, each shipment carries its one
    bucket, and the exact range filter runs after the bucket join."""
    orders = load_table(spark, sf, "orders")
    li = load_table(spark, sf, "lineitem")

    top = (
        orders.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(50)
        .select(
            "o_orderkey",
            F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01"))
            .alias("d0"),
        )
    )
    ow = top.select(
        "o_orderkey",
        "d0",
        F.explode(
            F.sequence(
                F.expr("d0 DIV 7"), F.expr("(d0 + 29) DIV 7")
            )
        ).alias("wk"),
    )
    lw = li.select(
        F.datediff(F.col("l_shipdate").cast("date"), F.lit("1970-01-01"))
        .alias("sd")
    ).select("sd", F.expr("sd DIV 7").alias("wk"))
    return (
        ow.join(
            lw,
            (ow.wk == lw.wk)
            & (F.col("sd") >= F.col("d0"))
            & (F.col("sd") < F.col("d0") + 30),
            "left",
        )
        .groupBy("o_orderkey")
        .agg(F.count("sd").alias("n_shipments"))
        .orderBy("o_orderkey")
    )


ORDER_WINDOW_SQL = """
WITH t AS (
  SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d0
  FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 50
)
SELECT t.o_orderkey, COUNT(l.l_shipdate) AS n_shipments
FROM t LEFT JOIN lineitem l
  ON CAST(l.l_shipdate AS DATE) >= t.d0
 AND CAST(l.l_shipdate AS DATE) < t.d0 + INTERVAL 30 DAY
GROUP BY 1 ORDER BY 1
"""


TIMESERIES_QUERIES = {
    "events_gapfill_locf": (events_gapfill_locf, EVENTS_GAPFILL_SQL),
    "order_window_shipments": (order_window_shipments, ORDER_WINDOW_SQL),
}
