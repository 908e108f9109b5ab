"""Fourteenth registry batch (round 9): exact distributed order
statistics and behavioral-sequence breadth —

- exact INTERPOLATED price quartiles (percentile_cont semantics)
  without a global sort: the two bracketing order statistics come
  from parallel_row_number and the interpolation is pure integer/
  power-of-two arithmetic, so the result is bit-exact across engines
  (never a percentile_cont call, whose interpolation float path is
  engine-private);
- per-user event-type transition matrix (the categorical Markov
  chain over each user's ordered event stream): one KEYED lag window
  plus a count aggregate — all integers.

Same contract rules as plans/analytics.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from .analytics import load_events


# ---------------------------------------------------------------------------
# Exact interpolated quartiles. With n rows sorted ascending, the
# p/4 quantile sits at h = (n−1)·p/4: lo = 1 + (n−1)·p DIV 4 (1-based),
# hi = lo+1 when the fractional part f = ((n−1)·p) % 4 quarters is
# non-zero. value = (x_lo·(4−f) + x_hi·f) / 4 — the numerator is an
# exact DECIMAL combination, and /4 is performed in DOUBLE (exact:
# power of two) — so both engines produce the identical bit pattern
# with no rounding discipline needed beyond the final display round.
# The rank pass is bucket-parallel; ties need no tiebreak because
# only (i, value) pairs are read and the sorted multiset is unique.
# ---------------------------------------------------------------------------


def price_quartiles_exact(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.ranks import parallel_row_number

    li = load_table(spark, sf, "lineitem").select("l_extendedprice")
    ranked = parallel_row_number(
        li, "l_extendedprice", [], out_col="i"
    ).localCheckpoint()  # feeds the lo-join AND the hi-join
    n = li.agg(F.count(F.lit(1)).alias("n"))
    pos = (
        spark.range(1, 4)
        .select(F.col("id").alias("p"))
        .crossJoin(F.broadcast(n))  # 1-row side
        .select(
            "p",
            (F.lit(1) + F.expr("((n - 1) * p) DIV 4")).alias("lo"),
            F.expr("((n - 1) * p) % 4").alias("f"),
        )
        .select(
            "p", "lo", "f",
            F.when(F.col("f") > 0, F.col("lo") + 1)
            .otherwise(F.col("lo"))
            .alias("hi"),
        )
    )
    xlo = ranked.join(F.broadcast(pos), ranked.i == pos.lo).select(
        "p", "f", F.col("l_extendedprice").alias("xlo")
    )
    xhi = ranked.join(
        F.broadcast(pos.select("p", "hi")), ranked.i == F.col("hi")
    ).select("p", F.col("l_extendedprice").alias("xhi"))
    return (
        xlo.join(F.broadcast(xhi), "p")  # 3 rows by construction
        .select(
            F.col("p").cast("int").alias("quartile"),
            F.round(
                (
                    F.col("xlo").cast("decimal(30,2)") * (4 - F.col("f"))
                    + F.col("xhi").cast("decimal(30,2)") * F.col("f")
                ).cast("double")
                / 4.0,
                4,
            ).alias("value"),
        )
        .orderBy("quartile")
    )


PRICE_QUARTILES_SQL = """
WITH ranked AS (
    SELECT l_extendedprice,
           ROW_NUMBER() OVER (ORDER BY l_extendedprice) AS i
    FROM lineitem
), n AS (SELECT COUNT(*) AS n FROM lineitem),
pos AS (
    SELECT r.p AS p,
           1 + ((n.n - 1) * r.p) // 4 AS lo,
           ((n.n - 1) * r.p) % 4 AS f,
           CASE WHEN ((n.n - 1) * r.p) % 4 > 0
                THEN 2 + ((n.n - 1) * r.p) // 4
                ELSE 1 + ((n.n - 1) * r.p) // 4 END AS hi
    FROM range(1, 4) r(p) CROSS JOIN n
), xlo AS (
    SELECT pos.p, pos.f, ranked.l_extendedprice AS xlo
    FROM ranked JOIN pos ON ranked.i = pos.lo
), xhi AS (
    SELECT pos.p, ranked.l_extendedprice AS xhi
    FROM ranked JOIN pos ON ranked.i = pos.hi
)
SELECT CAST(xlo.p AS INT) AS quartile,
       ROUND(CAST(CAST(xlo AS DECIMAL(30,2)) * (4 - f)
                  + CAST(xhi AS DECIMAL(30,2)) * f AS DOUBLE) / 4.0,
             4) AS value
FROM xlo JOIN xhi ON xlo.p = xhi.p
ORDER BY quartile
"""


# ---------------------------------------------------------------------------
# Event-type transition matrix: per user, consecutive event pairs by
# (ts, event_id) order — one KEYED lag window (parallel across users
# at any scale), then a 25-cell count aggregate. All integers.
# ---------------------------------------------------------------------------


def event_type_transitions(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_events(spark, sf).select(
        "user_id", "ts_us", "event_id", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    return (
        ev.select(
            "event_type",
            F.lag("event_type").over(w).alias("prev_type"),
        )
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy("prev_type", "event_type")
    )


EVENT_TRANSITIONS_SQL = """
WITH seq AS (
    SELECT event_type,
           LAG(event_type) OVER (PARTITION BY user_id
                                 ORDER BY epoch_us(ts), event_id)
               AS prev_type
    FROM events
)
SELECT prev_type, event_type, CAST(COUNT(*) AS BIGINT) AS n
FROM seq WHERE prev_type IS NOT NULL
GROUP BY prev_type, event_type
ORDER BY prev_type, event_type
"""


EXT14_QUERIES = {
    "price_quartiles_exact": (price_quartiles_exact, PRICE_QUARTILES_SQL),
    "event_type_transitions": (event_type_transitions, EVENT_TRANSITIONS_SQL),
}


# ---------------------------------------------------------------------------
# Multi-quantile grid from ONE grouped rank pass: p10/p50/p90 per
# event type as exact ceil(p·n)-th order statistics — three
# percentiles priced at one rank (the two-pass MAD pattern shows the
# chained variant; this is the flat one). Elements, never
# interpolation, so cross-engine exactness is free; positions are
# pure integer ceilings. For tiny groups the positions can coincide —
# each conditional max then picks the same element, identically on
# both engines.
# ---------------------------------------------------------------------------


def value_percentile_grid_by_type(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.ranks import parallel_row_number

    e = load_events(spark, sf).select("event_type", "event_id", "value")
    r = parallel_row_number(
        e, "value", ["event_id"], part_cols=["event_type"], out_col="i"
    )
    nn = e.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    picked = (
        r.join(F.broadcast(nn), "event_type")  # one row per type
        .filter(
            (F.col("i") == F.expr("(n + 9) DIV 10"))
            | (F.col("i") == F.expr("(n + 1) DIV 2"))
            | (F.col("i") == F.expr("(9 * n + 9) DIV 10"))
        )
    )
    return (
        picked.groupBy("event_type")
        .agg(
            F.max(
                F.when(F.col("i") == F.expr("(n + 9) DIV 10"), F.col("value"))
            ).alias("p10"),
            F.max(
                F.when(F.col("i") == F.expr("(n + 1) DIV 2"), F.col("value"))
            ).alias("p50"),
            F.max(
                F.when(
                    F.col("i") == F.expr("(9 * n + 9) DIV 10"), F.col("value")
                )
            ).alias("p90"),
        )
        .orderBy("event_type")
    )


PERCENTILE_GRID_SQL = """
WITH r AS (
    SELECT event_type, value,
           ROW_NUMBER() OVER (PARTITION BY event_type
                              ORDER BY value, event_id) AS i,
           COUNT(*) OVER (PARTITION BY event_type) AS n
    FROM events
)
SELECT event_type,
       MAX(CASE WHEN i = (n + 9) // 10 THEN value END) AS p10,
       MAX(CASE WHEN i = (n + 1) // 2 THEN value END) AS p50,
       MAX(CASE WHEN i = (9 * n + 9) // 10 THEN value END) AS p90
FROM r
WHERE i = (n + 9) // 10 OR i = (n + 1) // 2 OR i = (9 * n + 9) // 10
GROUP BY event_type
ORDER BY event_type
"""

EXT14_QUERIES["value_percentile_grid_by_type"] = (
    value_percentile_grid_by_type,
    PERCENTILE_GRID_SQL,
)
