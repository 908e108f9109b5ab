"""Twenty-second registry batch (round 14): count-min sketch — the
frequency member of the mergeable-sketch family the engine already
ships (HLL distinct counts, KMV distinct-set algebra, AMS second
moments; operators/sketches.py). The sketch is a RELATION of sparse
(row_idx, pos, cnt) counter cells bounded at width*depth, built by
one map-side-combined groupBy and probed by a broadcast join — all
JVM Column algebra, nothing driver-side.

`cms_part_frequencies` (rows-only): per-key frequency estimates for
a deterministic probe subset of lineitem part keys (l_partkey % 97
== 0), from a width=4096 / depth=5 sketch over the whole fact table.
Estimates are not DuckDB-expressible (the rows-only + oracled-gate
contract, the Bloom/ANN precedent).

`cms_check` (oracled, 1-row digest): the two CMS laws. (a) NO
UNDERESTIMATE — est >= true count for every probed key, structural
(a key's own occurrences always land in its counters). (b) the
overshoot is collision mass: E[overshoot] <= N/width per row and the
min over depth=5 independent rows drives the tail down geometrically
(Cormode & Muthukrishnan 2005), so est - true <= 8*(N/width) + 20
with failure probability ~(1/8)^5 per key — and the xxhash64
positions are DETERMINISTIC given the data, so at a fixed SF the
check either always passes or always fails: no flake, just a pinned
bound. DuckDB recomputes the exact side (fact rows, probe count);
the law booleans ride as TRUE literals (the suite-gate convention).
Folds into approx_suite_check as the 19th driver-enforced family.

Scale posture: the build shuffles at most width*depth counter cells
regardless of fact cardinality (map-side combine does the heavy
fold); the probe broadcasts those same <= 20480 cells. Partials
merge by per-cell addition, so the streaming twin
(streaming/sketches.py::run_streaming_cms) rides the
byte-identical-partial replay discipline exactly like AMS.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.sketches import cms_estimates, cms_sketch
from ..sources.catalog import load_table

_WIDTH = 4096
_DEPTH = 5


def _fact_and_probes(
    spark: SparkSession, sf: str
) -> tuple[DataFrame, DataFrame]:
    li = load_table(spark, sf, "lineitem").select("l_partkey")
    probes = li.filter(F.col("l_partkey") % 97 == 0).distinct()
    return li, probes


def cms_part_frequencies(spark: SparkSession, sf: str) -> DataFrame:
    li, probes = _fact_and_probes(spark, sf)
    sk = cms_sketch(li, "l_partkey", width=_WIDTH, depth=_DEPTH)
    return (
        cms_estimates(sk, probes, "l_partkey", width=_WIDTH, depth=_DEPTH)
        .select("l_partkey", F.col("est").cast("long").alias("est_cnt"))
        .orderBy("l_partkey")
    )


def cms_check(spark: SparkSession, sf: str) -> DataFrame:
    li, probes = _fact_and_probes(spark, sf)
    sk = cms_sketch(li, "l_partkey", width=_WIDTH, depth=_DEPTH)
    est = cms_estimates(sk, probes, "l_partkey", width=_WIDTH, depth=_DEPTH)
    true = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("tru"))
    joined = est.join(true, "l_partkey", "left").select(
        "l_partkey",
        "est",
        F.coalesce(F.col("tru"), F.lit(0)).alias("tru"),
    )
    n_rows = li.agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
    bound = F.col("n_rows").cast("double") / F.lit(float(_WIDTH)) * 8 + 20
    return (
        joined.agg(
            F.count(F.lit(1)).cast("long").alias("n_probes"),
            F.bool_and(F.col("est") >= F.col("tru")).alias("no_under"),
            F.max(F.col("est") - F.col("tru")).alias("_max_over"),
        )
        .crossJoin(F.broadcast(n_rows))
        .select(
            "n_rows",
            "n_probes",
            F.col("no_under").alias("no_underestimate"),
            (F.col("_max_over").cast("double") <= bound).alias("bound_ok"),
        )
    )


# DuckDB twin: exact side only (fact cardinality + probe-key count);
# the CMS laws ride as TRUE literals the Spark row must match.
CMS_CHECK_SQL = r"""
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem) AS n_rows,
       (SELECT CAST(COUNT(DISTINCT l_partkey) AS BIGINT)
        FROM lineitem WHERE l_partkey % 97 = 0) AS n_probes,
       TRUE AS no_underestimate, TRUE AS bound_ok
"""


EXT22_QUERIES = {
    "cms_part_frequencies": (cms_part_frequencies, None),
    "cms_check": (cms_check, CMS_CHECK_SQL),
}
