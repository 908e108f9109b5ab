"""Twelfth registry batch (round 8): the remaining growth-accounting
and concentration staples, built on the exact parallel prefix-sum
(operators/ranks.py::parallel_prefix_sum) —

- trailing-7-day active users (WAU per day) — distinct (user, day)
  incidence range-joined against the calendar-bounded day frame;
- daily new-vs-returning split (pairs with cumulative_unique_users
  and the streaming first-seen fold);
- revenue Pareto point (how many top customers cover 80% of
  revenue) — descending-rank cumulative spend, exact decimals;
- weighted median line price (quantity-weighted) — the first row
  where twice the cumulative weight reaches the total.

Same contract rules as plans/analytics.py: identical aliases both
engines, exact decimal cumulatives (the parallel prefix-sum is EQUAL
to a plain window, proven by the hash), single rounded divisions,
all-integer outputs where possible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from .analytics import load_events


# ---------------------------------------------------------------------------
# Trailing-7-day active users per day. Incidence = distinct
# (user, day); each incidence row contributes to the 7 target days
# [day, day+6] — implemented as a range join against the DISTINCT
# day frame, which is calendar-bounded (the CUSUM argument), so the
# join output is ≤ 7·|incidence| — linear. The day frame is
# legitimately hint-broadcast: bounded by the calendar, not the
# corpus. All-integer output.
# ---------------------------------------------------------------------------


def wau_trailing_7d(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_events(spark, sf)
    du = (
        ev.select("user_id", F.expr("ts_sec DIV 86400").alias("day"))
        .distinct()
    )
    days = du.select(F.col("day").alias("d")).distinct()
    return (
        du.join(
            F.broadcast(days),  # calendar-bounded side
            (F.col("day") <= F.col("d")) & (F.col("day") >= F.col("d") - 6),
        )
        .groupBy("d")
        .agg(F.countDistinct("user_id").alias("wau"))
        .select(F.col("d").alias("day"), F.col("wau").cast("long").alias("wau"))
        .orderBy("day")
    )


WAU_SQL = """
WITH du AS (
    SELECT DISTINCT user_id,
           CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day
    FROM events
), days AS (
    SELECT DISTINCT day AS d FROM du
)
SELECT d AS day, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau
FROM du JOIN days ON du.day <= d AND du.day >= d - 6
GROUP BY d ORDER BY day
"""


# ---------------------------------------------------------------------------
# Daily new vs returning actives: actives = distinct (user, day);
# a user's first-seen day marks them "new" on exactly that day and
# "returning" on every later active day. One MIN groupBy + one
# integer comparison — the batch twin of the streaming first-seen
# MIN fold (streaming/events.py::run_first_seen_sink). All-integer.
# ---------------------------------------------------------------------------


def daily_new_vs_returning(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_events(spark, sf)
    du = (
        ev.select("user_id", F.expr("ts_sec DIV 86400").alias("day"))
        .distinct()
    )
    first = du.groupBy("user_id").agg(F.min("day").alias("first_day"))
    return (
        du.join(first, "user_id")
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_active"),
            F.sum((F.col("day") == F.col("first_day")).cast("int"))
            .cast("long")
            .alias("n_new"),
            F.sum((F.col("day") > F.col("first_day")).cast("int"))
            .cast("long")
            .alias("n_returning"),
        )
        .orderBy("day")
    )


NEW_VS_RETURNING_SQL = """
WITH du AS (
    SELECT DISTINCT user_id,
           CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day
    FROM events
), first AS (
    SELECT user_id, MIN(day) AS first_day FROM du GROUP BY user_id
)
SELECT day,
       CAST(COUNT(*) AS BIGINT) AS n_active,
       CAST(SUM(CASE WHEN day = first_day THEN 1 ELSE 0 END) AS BIGINT)
           AS n_new,
       CAST(SUM(CASE WHEN day > first_day THEN 1 ELSE 0 END) AS BIGINT)
           AS n_returning
FROM du JOIN first USING (user_id)
GROUP BY day ORDER BY day
"""


# ---------------------------------------------------------------------------
# Revenue Pareto point: the smallest k such that the top-k customers
# (by spend, ties broken by custkey) cover ≥ 80% of total revenue.
# Customers rank DESCENDING via the parallel prefix-sum ordered on
# the NEGATED spend (the bucket function must be monotone in the
# order key); the cumulative spend is exact decimal, so the ≥-80%
# crossing row is engine-exact: it is the FIRST row where
# 100·cum ≥ 80·total — pure decimal/integer comparisons, no float
# share ever computed before the final rounded output columns.
# ---------------------------------------------------------------------------


def revenue_pareto_8020(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.ranks import parallel_prefix_sum

    spend = (
        load_table(spark, sf, "orders")
        .groupBy("o_custkey")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(30,2)")).alias("spend")
        )
        .withColumn("neg", -F.col("spend").cast("double"))
    )
    cum = parallel_prefix_sum(
        spend, "spend", "neg", ["o_custkey"], scale=2, out_col="cum"
    )
    totals = spend.agg(
        F.sum("spend").alias("total"),
        F.count(F.lit(1)).alias("n_customers"),
    )
    crossed = (
        cum.crossJoin(F.broadcast(totals))  # 1-row side
        .filter(F.col("cum") * 100 >= F.col("total") * 80)
        .agg(
            F.min(
                F.struct(
                    (-F.col("spend")).alias("neg"), "o_custkey", "cum",
                    "total", "n_customers",
                )
            ).alias("s")
        )
    )
    # the first crossing row is the MIN in descending-spend order —
    # recovered via a struct-min so no second global sort is needed
    k = (
        cum.crossJoin(F.broadcast(totals))
        .filter(F.col("cum") * 100 < F.col("total") * 80)
        .agg(F.count(F.lit(1)).alias("below"))
    )
    return (
        k.crossJoin(F.broadcast(crossed))
        .select(
            (F.col("below") + 1).cast("long").alias("k_customers"),
            F.col("s.n_customers").cast("long").alias("n_customers"),
            F.round(
                F.col("s.cum").cast("double") / F.col("s.total").cast("double"),
                6,
            ).alias("share_at_k"),
            F.round(
                (F.col("below") + 1) / F.col("s.n_customers"), 6
            ).alias("k_fraction"),
        )
    )


PARETO_SQL = """
WITH spend AS (
    SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(30,2))) AS spend
    FROM orders GROUP BY o_custkey
), cum AS (
    SELECT o_custkey, spend,
           SUM(spend) OVER (ORDER BY spend DESC, o_custkey
                            ROWS UNBOUNDED PRECEDING) AS cum
    FROM spend
), totals AS (
    SELECT SUM(spend) AS total, COUNT(*) AS n_customers FROM spend
), crossing AS (
    SELECT cum FROM cum CROSS JOIN totals
    WHERE cum * 100 >= total * 80
    ORDER BY spend DESC, o_custkey LIMIT 1
), below AS (
    SELECT COUNT(*) AS below FROM cum CROSS JOIN totals
    WHERE cum * 100 < total * 80
)
SELECT CAST(below + 1 AS BIGINT) AS k_customers,
       CAST(n_customers AS BIGINT) AS n_customers,
       ROUND(CAST(crossing.cum AS DOUBLE) / CAST(total AS DOUBLE), 6)
           AS share_at_k,
       ROUND(CAST(below + 1 AS DOUBLE) / n_customers, 6) AS k_fraction
FROM below CROSS JOIN crossing CROSS JOIN totals
"""


# ---------------------------------------------------------------------------
# Quantity-weighted median line price: the smallest price p (ties on
# the synthetic row order) such that the cumulative quantity through
# p reaches half the total — the first row where 2·cum ≥ W. Both the
# cumulative and total weights are exact decimal sums of integer
# quantities, so the crossing row is engine-exact. The prefix sum
# runs on the parallel bucket decomposition; the oracle is a plain
# cumulative window.
# ---------------------------------------------------------------------------


def weighted_median_price(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.ranks import parallel_prefix_sum

    li = load_table(spark, sf, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_extendedprice").alias("price"),
        F.col("l_quantity").alias("qty"),
    )
    cum = parallel_prefix_sum(
        li, "qty", "price", ["l_orderkey", "l_linenumber"],
        scale=2, out_col="cum",
    )
    w = li.agg(F.sum(F.col("qty").cast("decimal(30,2)")).alias("wtot"))
    return (
        cum.crossJoin(F.broadcast(w))  # 1-row side
        .filter(F.col("cum") * 2 >= F.col("wtot"))
        .agg(
            F.min(
                F.struct("price", "l_orderkey", "l_linenumber", "wtot")
            ).alias("s")
        )
        .select(
            F.round(F.col("s.price"), 2).alias("weighted_median_price"),
            F.round(F.col("s.wtot").cast("double"), 2).alias("total_qty"),
        )
    )


WEIGHTED_MEDIAN_SQL = """
WITH li AS (
    SELECT l_orderkey, l_linenumber, l_extendedprice AS price,
           l_quantity AS qty
    FROM lineitem
), cum AS (
    SELECT price, l_orderkey, l_linenumber,
           SUM(CAST(qty AS DECIMAL(30,2)))
               OVER (ORDER BY price, l_orderkey, l_linenumber
                     ROWS UNBOUNDED PRECEDING) AS cum
    FROM li
), w AS (
    SELECT SUM(CAST(qty AS DECIMAL(30,2))) AS wtot FROM li
), crossing AS (
    SELECT price FROM cum CROSS JOIN w
    WHERE cum * 2 >= wtot
    ORDER BY price, l_orderkey, l_linenumber LIMIT 1
)
SELECT ROUND(crossing.price, 2) AS weighted_median_price,
       ROUND(CAST(w.wtot AS DOUBLE), 2) AS total_qty
FROM crossing CROSS JOIN w
"""


EXT12_QUERIES = {
    "wau_trailing_7d": (wau_trailing_7d, WAU_SQL),
    "daily_new_vs_returning": (daily_new_vs_returning, NEW_VS_RETURNING_SQL),
    "revenue_pareto_8020": (revenue_pareto_8020, PARETO_SQL),
    "weighted_median_price": (weighted_median_price, WEIGHTED_MEDIAN_SQL),
}
