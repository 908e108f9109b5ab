"""Fourteenth registry batch (round 9): exact distributed order
statistics and behavioral-sequence breadth —

- exact INTERPOLATED price quartiles (percentile_cont semantics)
  without a global sort: the two bracketing order statistics come
  from parallel_row_number and the interpolation is pure integer/
  power-of-two arithmetic, so the result is bit-exact across engines
  (never a percentile_cont call, whose interpolation float path is
  engine-private);
- grouped robust outliers by MAD (median absolute deviation): TWO
  chained grouped rank passes (median of values, then median of
  deviations) — the double-rank pattern that exercises
  parallel_row_number's part_cols path, with the odd/even middle
  handled by the same exact bracketing;
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
# Grouped MAD outliers. Medians are the LOWER-MIDDLE order statistic
# m = x_((n+1) DIV 2) — the odd-window rule the repo standardized on
# (an interpolated even-n middle would be engine-exact here too, but
# the discrete pick needs no arithmetic at all). Two chained grouped
# rank passes: rank values within event_type → median per type; rank
# |value − median| within type → MAD per type; outliers are rows
# with |value − median| > 3·MAD (identical IEEE operands on both
# engines, so the comparison is engine-exact). Each pass is the
# grouped bucket decomposition — no per-type single reducer.
# ---------------------------------------------------------------------------


def value_mad_outliers(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.ranks import parallel_row_number

    e = load_events(spark, sf).select("event_type", "event_id", "value")
    r1 = parallel_row_number(
        e, "value", ["event_id"], part_cols=["event_type"], out_col="i"
    )
    # nn/med/mad are ONE ROW PER EVENT TYPE — bounded by the type
    # vocabulary, not the corpus, so the broadcast hints are safe at
    # any scale (the bounded-by-construction hint rule)
    nn = e.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    med = (
        r1.join(F.broadcast(nn), "event_type")
        .filter(F.col("i") == F.expr("(n + 1) DIV 2"))
        .select("event_type", F.col("value").alias("median"), "n")
    )  # one row per type
    dev = e.join(F.broadcast(med), "event_type").select(
        "event_type",
        "event_id",
        "value",
        "median",
        "n",
        F.abs(F.col("value") - F.col("median")).alias("d"),
    ).localCheckpoint()  # feeds the dev-rank AND the outlier count
    r2 = parallel_row_number(
        dev, "d", ["event_id"], part_cols=["event_type"], out_col="j"
    )
    mad = r2.filter(F.col("j") == F.expr("(n + 1) DIV 2")).select(
        "event_type", F.col("d").alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.max("median").alias("median"),
            F.max("mad").alias("mad"),
            F.sum((F.col("d") > 3 * F.col("mad")).cast("int"))
            .cast("long")
            .alias("n_outliers"),
        )
        .orderBy("event_type")
    )


VALUE_MAD_SQL = """
WITH e AS (
    SELECT event_type, event_id, value FROM events
), r1 AS (
    SELECT event_type, value,
           ROW_NUMBER() OVER (PARTITION BY event_type
                              ORDER BY value, event_id) AS i,
           COUNT(*) OVER (PARTITION BY event_type) AS n
    FROM e
), med AS (
    SELECT event_type, value AS median, n
    FROM r1 WHERE i = (n + 1) // 2
), dev AS (
    SELECT e.event_type, e.event_id, med.median, med.n,
           abs(e.value - med.median) AS d
    FROM e JOIN med USING (event_type)
), r2 AS (
    SELECT event_type, d,
           ROW_NUMBER() OVER (PARTITION BY event_type
                              ORDER BY d, event_id) AS j,
           n
    FROM dev
), mad AS (
    SELECT event_type, d AS mad FROM r2 WHERE j = (n + 1) // 2
)
SELECT dev.event_type,
       MAX(dev.median) AS median,
       MAX(mad.mad) AS mad,
       CAST(SUM(CASE WHEN dev.d > 3 * mad.mad THEN 1 ELSE 0 END) AS BIGINT)
           AS n_outliers
FROM dev JOIN mad USING (event_type)
GROUP BY dev.event_type
ORDER BY dev.event_type
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
    "value_mad_outliers": (value_mad_outliers, VALUE_MAD_SQL),
    "event_type_transitions": (event_type_transitions, EVENT_TRANSITIONS_SQL),
}
