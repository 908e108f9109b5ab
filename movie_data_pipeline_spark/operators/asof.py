"""As-of (temporal nearest) join — an operator the reference lacks
(SURVEY §2.3 notes no as-of/range joins anywhere in the workload) but a
time-series/training-data pipeline needs constantly: for each left row,
the latest right row at-or-before its timestamp (backward) or the
earliest at-or-after (forward), per key.

Spark-first design: no built-in as-of join exists, so this composes one
from a UNION + single window pass — both sides shuffle ONCE on the key,
then a per-key ordered scan carries the most recent right-side values
forward with ``last(..., ignorenulls=True)``. That is the merge-join
formulation: O(n log n) per key for the sort, no candidate explosion,
no right-side broadcast needed, and it scales to arbitrarily many left
rows per key (unlike the join-then-rank formulation, which materializes
every (left, right) candidate pair before pruning).

Tie semantics at equal timestamps: right rows sort BEFORE left rows, so
a backward as-of sees a right row with ts == left ts (<= semantics,
matching DuckDB/pandas ``merge_asof`` defaults). Callers with multiple
right rows at the same (key, ts) should pre-dedup to make the winner
deterministic.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    direction: str = "backward",
) -> DataFrame:
    """Left as-of join: every left row, plus ``value_cols`` from the
    temporally nearest right row per ``on`` key (NULLs when none
    qualifies). ``left_ts``/``right_ts`` must be mutually comparable
    (same unit — e.g. both epoch-µs longs).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")

    on = list(on)
    value_cols = list(value_cols)
    left_cols = left.columns

    l2 = left.select(
        *on,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*left_cols).alias("_l"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in value_cols],
    )
    r2 = right.select(
        *on,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(l2.schema["_l"].dataType).alias("_l"),
        *value_cols,
    )

    ts_order = F.asc("_ts") if direction == "backward" else F.desc("_ts")
    w = (
        Window.partitionBy(*on)
        .orderBy(ts_order, F.asc("_side"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = l2.unionByName(r2).select(
        "*",
        *[
            F.last(c, ignorenulls=True).over(w).alias(f"_m_{c}")
            for c in value_cols
        ],
    )
    return carried.filter(F.col("_side") == 1).select(
        *[F.col(f"_l.{c}").alias(c) for c in left_cols],
        *[F.col(f"_m_{c}").alias(c) for c in value_cols],
    )
