"""Global (or per-group) ROW_NUMBER without a single-partition
window — the bucket decomposition used by score_auc / value_drift_ks
/ customer_spend_gini, factored as a reusable operator.

The trick: bucket rows by a fixed-width function of the ORDER-BY
value (from a one-row — or one-row-per-group — bounds aggregate), so
the bucket is monotone in the value and equal values share a bucket.
Then global row_number = (count of rows in earlier buckets) +
(row_number inside the bucket). The in-bucket windows parallelize
across (group, bucket); the prefix table has ≤ n_buckets rows per
group and rides a dimension-sized join. The companion DuckDB oracles
use plain global windows, so every registry hash match re-proves the
decomposition.

At 100 TB: the bounds pass is one aggregate; the heavy sort is the
per-bucket window, whose width is data/nbuckets on average — skewed
value distributions concentrate rows in few buckets, which an
adaptive second-level split would fix; for the registry's metrics
(scores, spends, event values) the fixed 256 split has been
sufficient and the plans carry no single-partition window.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def parallel_row_number(
    df: DataFrame,
    value_col: str,
    tiebreaks: Sequence[str],
    part_cols: Sequence[str] = (),
    nbuckets: int = 256,
    out_col: str = "i",
) -> DataFrame:
    """Append ``out_col`` = 1-based ROW_NUMBER over
    (PARTITION BY part_cols ORDER BY value_col, *tiebreaks), computed
    with bucket-parallel windows. (value_col, *tiebreaks) must be a
    total order within each group for the result to be well-defined.
    """
    part = list(part_cols)
    bounds = df.groupBy(*part).agg(
        F.min(value_col).cast("double").alias("_s0"),
        F.max(value_col).cast("double").alias("_s1"),
    )
    if part:
        b = df.join(bounds, part)  # dimension-sized, un-hinted
    else:
        b = df.crossJoin(F.broadcast(bounds))  # 1-row side
    b = b.withColumn(
        "_b",
        F.least(
            F.floor(
                (F.col(value_col).cast("double") - F.col("_s0"))
                / F.greatest(
                    (F.col("_s1") - F.col("_s0")) / F.lit(float(nbuckets)),
                    F.lit(1e-300),
                )
            ).cast("int"),
            F.lit(nbuckets - 1),
        ),
    # the bucketed relation feeds BOTH the in-bucket windows and the
    # prefix aggregate — cut lineage so the upstream (scans, joins,
    # prior rank calls) executes once, not once per consumer arm
    # (pre-cut, a 3×-chained rfm ranking re-ran the base scan 69×)
    ).localCheckpoint()
    in_bucket = Window.partitionBy(*part, "_b").orderBy(
        value_col, *tiebreaks
    )
    prefix_w = (
        Window.partitionBy(*part)
        .orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prefix = (
        b.groupBy(*part, "_b")
        .agg(F.count(F.lit(1)).alias("_bn"))
        .select(
            *part,
            "_b",
            F.coalesce(F.sum("_bn").over(prefix_w), F.lit(0)).alias("_pfx"),
        )
    )
    joined = (
        b.withColumn("_rin", F.row_number().over(in_bucket)).join(
            F.broadcast(prefix) if not part else prefix, [*part, "_b"]
        )
    )
    return joined.withColumn(
        out_col, (F.col("_pfx") + F.col("_rin")).cast("long")
    ).drop("_s0", "_s1", "_b", "_bn", "_rin", "_pfx")


def parallel_prefix_sum(
    df: DataFrame,
    value_col: str,
    order_col: str,
    tiebreaks: Sequence[str],
    nbuckets: int = 256,
    scale: int = 6,
    out_col: str = "cum",
) -> DataFrame:
    """Append ``out_col`` = the EXACT-decimal running sum of
    ``value_col`` over (ORDER BY order_col, *tiebreaks), with the
    same bucket decomposition as parallel_row_number: in-bucket
    cumulative decimal windows + a ≤nbuckets-row bucket-total prefix
    table. Because the per-term casts and the decimal adds are exact,
    the decomposition is EQUAL (not approximately equal) to a global
    cumulative window — which is what lets registry oracles hash-
    compare it against DuckDB's plain window.

    Same 100-TB posture as parallel_row_number; same skew caveat
    (value-concentrated order keys pile into few buckets).
    """
    dec = f"decimal(30,{scale})"
    bounds = df.agg(
        F.min(order_col).cast("double").alias("_s0"),
        F.max(order_col).cast("double").alias("_s1"),
    )
    b = df.crossJoin(F.broadcast(bounds)).withColumn(  # 1-row side
        "_b",
        F.least(
            F.floor(
                (F.col(order_col).cast("double") - F.col("_s0"))
                / F.greatest(
                    (F.col("_s1") - F.col("_s0")) / F.lit(float(nbuckets)),
                    F.lit(1e-300),
                )
            ).cast("int"),
            F.lit(nbuckets - 1),
        ),
    ).localCheckpoint()  # feeds the window arm AND the prefix arm
    in_bucket = (
        Window.partitionBy("_b")
        .orderBy(order_col, *tiebreaks)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    prefix_w = Window.orderBy("_b").rowsBetween(
        Window.unboundedPreceding, -1
    )
    prefix = (
        b.groupBy("_b")
        .agg(F.sum(F.col(value_col).cast(dec)).alias("_bt"))
        .select(
            "_b",
            F.coalesce(
                F.sum("_bt").over(prefix_w), F.lit(0).cast(dec)
            ).alias("_pfx"),
        )
    )
    joined = b.withColumn(
        "_cin", F.sum(F.col(value_col).cast(dec)).over(in_bucket)
    ).join(F.broadcast(prefix), "_b")
    return joined.withColumn(
        out_col, (F.col("_pfx") + F.col("_cin")).cast(dec)
    ).drop("_s0", "_s1", "_b", "_bt", "_cin", "_pfx")
