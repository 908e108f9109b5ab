"""Sixteenth registry batch (round 11): the NULLS FIRST oracle
contract exercised for real, plus the sketch families — KMV distinct
sketches with set algebra and AMS frequency-moment sketches
(operators/sketches.py), each a rows-only estimate entry behind an
oracled error-bound gate.

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
    return ranked.select("o_orderkey", "v", "i").sortWithinPartitions("i")


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
    # All unordered pairs from the per-group counts, LEFT-joined with
    # the intersection counts and coalesced to 0 (r11 ADVICE): an
    # inner join on `inter` silently dropped any DISJOINT pair —
    # exactly the pair whose est_intersection most needs gating.
    exact = (
        exact_per.select(
            F.col("p").alias("g_a"), F.col("exact_n").alias("exact_a")
        )
        .join(
            exact_per.select(
                F.col("p").alias("g_b"), F.col("exact_n").alias("exact_b")
            ),
            F.col("g_a") < F.col("g_b"),
        )
        .join(inter, ["g_a", "g_b"], "left")
        .withColumn("exact_inter", F.coalesce("exact_inter", F.lit(0)))
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
inter AS (
    SELECT x.p AS g_a, y.p AS g_b, COUNT(*) AS exact_inter
    FROM d x JOIN d y ON x.c = y.c AND x.p < y.p
    GROUP BY x.p, y.p
),
pair AS (
    -- every unordered pair, disjoint ones included (coalesce 0):
    -- an inner join on `inter` would drop exactly the pair whose
    -- est_intersection most needs gating
    SELECT pa.p AS g_a, pb.p AS g_b,
           pa.exact_n AS exact_a, pb.exact_n AS exact_b,
           COALESCE(i.exact_inter, 0) AS exact_inter
    FROM per pa
    JOIN per pb ON pa.p < pb.p
    LEFT JOIN inter i ON i.g_a = pa.p AND i.g_b = pb.p
)
SELECT g_a, g_b,
       CAST(exact_a AS BIGINT) AS exact_a,
       CAST(exact_b AS BIGINT) AS exact_b,
       CAST(exact_a + exact_b - exact_inter AS BIGINT) AS exact_union,
       CAST(exact_inter AS BIGINT) AS exact_inter,
       TRUE AS distinct_in_bound,
       TRUE AS union_in_bound,
       TRUE AS inter_in_bound
FROM pair
ORDER BY g_a, g_b
"""


# ---------------------------------------------------------------------------
# AMS sign sketches (operators/sketches.py): F2 / join-size estimation
# in one aggregate pass — the planner statistics (self-join size, skew
# mass, pre-join cardinality) a 100 TB engine wants without running
# the join or a per-key groupBy. Deterministic replica-seeded
# xxhash64; the estimates are rows-only (no SQL engine reproduces the
# signs) and the _check gate pins the one observed error against the
# AMS theory bound with exacts the oracle recomputes.
# ---------------------------------------------------------------------------

_AMS_S2 = 32  # replicas averaged per group (Var[mean] <= 2*F2^2/s2)
_AMS_S1 = 5   # means medianed (tail bound)


def ams_skew_profile(spark: SparkSession, sf: str) -> DataFrame:
    """Per-column one-pass skew diagnostics on lineitem: estimated
    self-join size (F2) and the F2/n ratio (mean collision weight) that
    decides whether a key needs salting. Rows-only; gated below."""
    from ..operators.sketches import ams_f2_estimate

    li = load_table(spark, sf, "lineitem")
    parts = []
    for col in ("l_partkey", "l_suppkey", "l_orderkey"):
        est = ams_f2_estimate(li, col, _AMS_S2, _AMS_S1).select(
            F.lit(col).alias("column_name"),
            "n_rows",
            F.round("est_f2", 1).alias("est_f2"),
            F.round(F.col("est_f2") / F.col("n_rows"), 3).alias(
                "est_mean_collisions"
            ),
        )
        parts.append(est)
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out.orderBy("column_name")


def ams_moment_check(spark: SparkSession, sf: str) -> DataFrame:
    """Gate: the F2 estimate lands within 2 sigma of the mean-of-32
    estimator (|est - F2| <= 0.5 * F2, since Var[mean] <= 2*F2^2/32)
    and the click-purchase join-size estimate within its 2 sigma
    (|est - J| <= 2*sqrt(2*F2_clicks*F2_purchases/32)). Exact F2s and
    the exact join size are recomputed by the DuckDB oracle; observed
    rel errs at build time: F2 0.080/0.030, join 0.018/0.168 at
    sf0.001/0.01 — inside bound at both."""
    from ..operators.sketches import ams_f2_estimate, ams_join_size_estimate

    li = load_table(spark, sf, "lineitem")
    ev = load_table(spark, sf, "events").select("user_id", "event_type")
    clicks = ev.filter(F.col("event_type") == "click")
    purch = ev.filter(F.col("event_type") == "purchase")

    est_f2 = ams_f2_estimate(li, "l_partkey", _AMS_S2, _AMS_S1)
    exact_f2 = (
        li.groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.sum(F.col("c") * F.col("c")).alias("f2_partkey_exact"))
    )
    est_j = ams_join_size_estimate(
        clicks, "user_id", purch, "user_id", _AMS_S2, _AMS_S1
    ).select("est_join_rows")
    exact_j = (
        clicks.join(purch, "user_id")
        .agg(F.count(F.lit(1)).alias("join_exact"))
    )

    def _f2(df, key, name):
        return (
            df.groupBy(key)
            .agg(F.count(F.lit(1)).alias("c"))
            .agg(F.sum(F.col("c") * F.col("c")).alias(name))
        )

    f2a = _f2(clicks, "user_id", "f2_clicks_exact")
    f2b = _f2(purch, "user_id", "f2_purchases_exact")

    # five 1-row sides — bounded crossJoins, the repo's scalar pattern
    row = (
        est_f2.crossJoin(exact_f2)
        .crossJoin(est_j)
        .crossJoin(exact_j)
        .crossJoin(f2a)
        .crossJoin(f2b)
    )
    join_bound = F.lit(2.0) * F.sqrt(
        F.lit(2.0)
        * F.col("f2_clicks_exact")
        * F.col("f2_purchases_exact")
        / F.lit(float(_AMS_S2))
    )
    return row.select(
        F.col("n_rows").cast("long").alias("n_lineitem"),
        F.col("f2_partkey_exact").cast("long").alias("f2_partkey_exact"),
        F.col("join_exact").cast("long").alias("join_clicks_purchases_exact"),
        F.col("f2_clicks_exact").cast("long").alias("f2_clicks_exact"),
        F.col("f2_purchases_exact").cast("long").alias("f2_purchases_exact"),
        (
            F.abs(F.col("est_f2") - F.col("f2_partkey_exact"))
            <= 0.5 * F.col("f2_partkey_exact")
        ).alias("f2_within_bound"),
        (F.abs(F.col("est_join_rows") - F.col("join_exact")) <= join_bound).alias(
            "join_within_bound"
        ),
    )


AMS_MOMENT_CHECK_SQL = """
WITH f2p AS (
    SELECT SUM(c * c) AS f2_partkey_exact
    FROM (SELECT COUNT(*) AS c FROM lineitem GROUP BY l_partkey)
),
jx AS (
    SELECT COUNT(*) AS join_exact
    FROM (SELECT user_id FROM events WHERE event_type = 'click') a
    JOIN (SELECT user_id FROM events WHERE event_type = 'purchase') b
      USING (user_id)
),
f2a AS (
    SELECT SUM(c * c) AS f2_clicks_exact
    FROM (SELECT COUNT(*) AS c FROM events
          WHERE event_type = 'click' GROUP BY user_id)
),
f2b AS (
    SELECT SUM(c * c) AS f2_purchases_exact
    FROM (SELECT COUNT(*) AS c FROM events
          WHERE event_type = 'purchase' GROUP BY user_id)
)
SELECT CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT) AS n_lineitem,
       CAST(f2p.f2_partkey_exact AS BIGINT) AS f2_partkey_exact,
       CAST(jx.join_exact AS BIGINT) AS join_clicks_purchases_exact,
       CAST(f2a.f2_clicks_exact AS BIGINT) AS f2_clicks_exact,
       CAST(f2b.f2_purchases_exact AS BIGINT) AS f2_purchases_exact,
       TRUE AS f2_within_bound,
       TRUE AS join_within_bound
FROM f2p, jx, f2a, f2b
"""


EXT16_QUERIES = {
    "null_key_order_ranks": (null_key_order_ranks, NULL_KEY_ORDER_RANKS_SQL),
    "kmv_priority_overlap": (kmv_priority_overlap, None),
    "kmv_overlap_check": (kmv_overlap_check, KMV_OVERLAP_CHECK_SQL),
    "ams_skew_profile": (ams_skew_profile, None),
    "ams_moment_check": (ams_moment_check, AMS_MOMENT_CHECK_SQL),
}
