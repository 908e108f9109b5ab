"""Sixteenth registry batch (round 11): the NULLS FIRST oracle
contract, exercised for real.

``operators/ranks.py`` routes NULL order keys to a dedicated lowest
bucket (Spark's ascending NULLS FIRST default), and its docstring has
carried a contract note since round 10: a DuckDB oracle's plain window
defaults to NULLS LAST, so a nullable order column needs an explicit
``NULLS FIRST`` in its oracle SQL. Shipped testdata has no NULL order
keys anywhere, so that divergence had unit tests but no live oracle
row — this entry injects NULLs deterministically (every 7th order key
in a fixed slice) and hash-compares the FULL ranked output row-by-row
against a DuckDB window carrying the explicit ``NULLS FIRST``, proving
the contract end-to-end: NULL keys occupy the lowest ranks compactly,
ordered by the tiebreak, and every non-NULL rank continues after them.

Same contract rules as plans/analytics.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.ranks import parallel_row_number
from ..operators.sketches import kmv_overlap, kmv_sketches
from ..sources.catalog import load_table


def null_key_order_ranks(spark: SparkSession, sf: str) -> DataFrame:
    orders = load_table(spark, sf, "orders")
    s = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 7 == 0, F.lit(None).cast("double"))
        .otherwise(F.col("o_totalprice"))
        .alias("v"),
    )
    ranked = parallel_row_number(s, "v", ["o_orderkey"], out_col="i")
    return ranked.select("o_orderkey", "v", "i").orderBy("i")


NULL_KEY_ORDER_RANKS_SQL = """
WITH s AS (
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 7 = 0 THEN NULL
                ELSE o_totalprice END AS v
    FROM orders
    WHERE o_orderpriority = '1-URGENT'
)
SELECT o_orderkey, v,
       ROW_NUMBER() OVER (ORDER BY v ASC NULLS FIRST, o_orderkey) AS i
FROM s
ORDER BY i
"""


# ---------------------------------------------------------------------------
# KMV distinct sketches with set algebra (operators/sketches.py):
# customer-audience overlap between order priorities from bottom-k
# hash sketches alone. approx_count_distinct's HLL state cannot be
# intersected; KMV's can, which is the 100 TB answer to "how many
# customers do segments A and B share" without a key-domain self-join
# per pair. Deterministic (xxhash64) — the estimates are stable
# numbers, but no SQL engine reproduces Spark's xxhash64, so the
# estimate entry is rows-only and the _check gate (oracled) pins each
# estimate against the Spark-side EXACT overlap within the theoretical
# KMV error bound.
# ---------------------------------------------------------------------------

_KMV_K = 512
# relative standard error of the KMV estimator ~ 1/sqrt(k-2)
_KMV_RSE = 1.0 / (float(_KMV_K - 2) ** 0.5)


def kmv_priority_overlap(spark: SparkSession, sf: str) -> DataFrame:
    orders = load_table(spark, sf, "orders")
    sk = kmv_sketches(orders, "o_orderpriority", "o_custkey", k=_KMV_K)
    out = kmv_overlap(sk, "o_orderpriority", k=_KMV_K)
    return out.select(
        "g_a",
        "g_b",
        F.round("est_a", 2).alias("est_a"),
        F.round("est_b", 2).alias("est_b"),
        F.round("est_union", 2).alias("est_union"),
        F.round("est_intersection", 2).alias("est_intersection"),
        F.round("jaccard_est", 4).alias("jaccard_est"),
    ).orderBy("g_a", "g_b")


def kmv_overlap_check(spark: SparkSession, sf: str) -> DataFrame:
    """Gate: every sketch estimate lands within its theoretical bound
    of the exact value (exacts recomputed by the DuckDB oracle; the
    booleans must come back TRUE from both engines).

    Bounds: 4x rse for distinct/union (Bar-Yossef et al.); the
    intersection estimate compounds rho's sampling error with the
    union estimate's, so its ABSOLUTE error is gated at 6x rse of the
    exact union (Beyer et al., SIGMOD'07 give the variance scaling in
    the union, not the intersection, size).
    """
    orders = load_table(spark, sf, "orders")
    sk = kmv_sketches(orders, "o_orderpriority", "o_custkey", k=_KMV_K)
    est = kmv_overlap(sk, "o_orderpriority", k=_KMV_K)

    d = orders.select(
        F.col("o_orderpriority").alias("p"), F.col("o_custkey").alias("c")
    ).distinct()
    exact_per = d.groupBy("p").agg(F.count(F.lit(1)).alias("exact_n"))
    inter = (
        d.alias("x")
        .join(d.alias("y"), (F.col("x.c") == F.col("y.c")) & (F.col("x.p") < F.col("y.p")))
        .groupBy(F.col("x.p").alias("g_a"), F.col("y.p").alias("g_b"))
        .agg(F.count(F.lit(1)).alias("exact_inter"))
    )
    exact = (
        inter.join(exact_per.withColumnRenamed("p", "g_a"), "g_a")
        .withColumnRenamed("exact_n", "exact_a")
        .join(exact_per.withColumnRenamed("p", "g_b"), "g_b")
        .withColumnRenamed("exact_n", "exact_b")
        .withColumn(
            "exact_union",
            F.col("exact_a") + F.col("exact_b") - F.col("exact_inter"),
        )
    )
    rel_bound = F.lit(4.0 * _KMV_RSE)
    joined = est.join(exact, ["g_a", "g_b"])
    return joined.select(
        "g_a",
        "g_b",
        F.col("exact_a").cast("long").alias("exact_a"),
        F.col("exact_b").cast("long").alias("exact_b"),
        F.col("exact_union").cast("long").alias("exact_union"),
        F.col("exact_inter").cast("long").alias("exact_inter"),
        (
            (F.abs(F.col("est_a") - F.col("exact_a")) / F.col("exact_a") <= rel_bound)
            & (F.abs(F.col("est_b") - F.col("exact_b")) / F.col("exact_b") <= rel_bound)
        ).alias("distinct_in_bound"),
        (
            F.abs(F.col("est_union") - F.col("exact_union")) / F.col("exact_union")
            <= rel_bound
        ).alias("union_in_bound"),
        (
            F.abs(F.col("est_intersection") - F.col("exact_inter"))
            <= F.lit(6.0 * _KMV_RSE) * F.col("exact_union")
        ).alias("inter_in_bound"),
    ).orderBy("g_a", "g_b")


KMV_OVERLAP_CHECK_SQL = """
WITH d AS (
    SELECT DISTINCT o_orderpriority AS p, o_custkey AS c FROM orders
),
per AS (
    SELECT p, COUNT(*) AS exact_n FROM d GROUP BY p
),
pair AS (
    SELECT x.p AS g_a, y.p AS g_b, COUNT(*) AS exact_inter
    FROM d x JOIN d y ON x.c = y.c AND x.p < y.p
    GROUP BY x.p, y.p
)
SELECT pair.g_a, pair.g_b,
       CAST(pa.exact_n AS BIGINT) AS exact_a,
       CAST(pb.exact_n AS BIGINT) AS exact_b,
       CAST(pa.exact_n + pb.exact_n - pair.exact_inter AS BIGINT) AS exact_union,
       CAST(pair.exact_inter AS BIGINT) AS exact_inter,
       TRUE AS distinct_in_bound,
       TRUE AS union_in_bound,
       TRUE AS inter_in_bound
FROM pair
JOIN per pa ON pa.p = pair.g_a
JOIN per pb ON pb.p = pair.g_b
ORDER BY g_a, g_b
"""


EXT16_QUERIES = {
    "null_key_order_ranks": (null_key_order_ranks, NULL_KEY_ORDER_RANKS_SQL),
    "kmv_priority_overlap": (kmv_priority_overlap, None),
    "kmv_overlap_check": (kmv_overlap_check, KMV_OVERLAP_CHECK_SQL),
}
