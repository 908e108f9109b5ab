"""Join pruning: broadcastable hash-bucket bitmap prefilter — the
hand-rolled form of the runtime bloom-filter join (Spark's
spark.sql.optimizer.runtime.bloomFilter applies the same idea
planner-side; rolling it as an operator makes the reduction explicit,
tunable, and usable from any plan).

A big fact ⋈ selective dim join moves the ENTIRE fact through the
shuffle before the join drops 99% of it. The fix: project the dim's
join keys onto a bounded bucket space (pmod(xxhash64(key), m)),
broadcast that distinct-bucket set (≤ m rows regardless of dim size),
and left-semi the fact on its key's bucket BEFORE the real join. No
false negatives (every true key's bucket is present), only false
positives (keys sharing a bucket), so correctness is untouched and
the exact join afterwards sees a fraction of the fact. At m = 2^16 a
0.1%-selective dim prunes ~99% of a uniform fact's rows pre-shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bucket_bitmap(dim: DataFrame, dim_key: str, n_buckets: int = 1 << 16) -> DataFrame:
    """Distinct hash-bucket set of the dim's join keys — at most
    ``n_buckets`` rows, always broadcastable."""
    return dim.select(
        F.pmod(F.xxhash64(F.col(dim_key)), F.lit(n_buckets)).alias("__bucket")
    ).distinct()


def bitmap_prefilter(
    fact: DataFrame,
    fact_key: str,
    buckets: DataFrame,
    n_buckets: int = 1 << 16,
) -> DataFrame:
    """Keep only fact rows whose key hashes into a dim-occupied bucket.
    The semi-join side is the bounded bucket set (broadcast), so this
    is a map-side filter: the fact never shuffles here."""
    return fact.join(
        F.broadcast(buckets),
        F.pmod(F.xxhash64(F.col(fact_key)), F.lit(n_buckets)) == F.col("__bucket"),
        "left_semi",
    )
