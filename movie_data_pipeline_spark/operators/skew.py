"""Skew-handling primitives: salted aggregation and salted joins.

AQE's skew-join splitting handles most runtime skew automatically
(enabled in session.py), but two shapes still need explicit salting at
100 TB:

- a groupBy whose hot key overwhelms one reducer: pre-aggregate on
  (key, salt) then re-aggregate on key — the classic two-level
  (partial + final) combine, expressed explicitly so the hot key fans
  out over ``n_salts`` reducers;
- a join with a hot probe-side key against a small-ish build side:
  salt the probe side, explode the build side across all salts, join
  on (key, salt).

Both are semantics-preserving for the decomposable aggregates used
here (count/sum/min/max — avg as sum/count).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int, col_name: str = "_salt") -> DataFrame:
    """Uniform deterministic salt derived from a whole-row hash (no
    rand(): deterministic retries/recomputation matter more than
    perfect uniformity)."""
    return df.withColumn(
        col_name, F.pmod(F.xxhash64(*df.columns), F.lit(n_salts)).cast("int")
    )


def salted_count_sum(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    n_salts: int = 16,
) -> DataFrame:
    """groupBy(keys) → (row_count, value_sum) with two-level salted
    aggregation. Output equals the direct groupBy exactly (sums are
    decomposable; decimal cast keeps the double sum order-independent).
    """
    keys = list(keys)
    partial = (
        with_salt(df, n_salts)
        .groupBy(*keys, "_salt")
        .agg(
            F.count(F.lit(1)).alias("_c"),
            F.sum(F.col(value_col).cast("decimal(30,6)")).alias("_s"),
        )
    )
    return partial.groupBy(*keys).agg(
        F.sum("_c").alias("row_count"),
        F.sum("_s").cast("double").alias("value_sum"),
    )


def salted_join(
    facts: DataFrame,
    dim: DataFrame,
    on: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the fact side salted and the dim side exploded
    across all salt values, so one hot key spreads over ``n_salts``
    partitions. The dim side grows ×n_salts — use only when dim is
    small enough to replicate but too big (or too skew-prone) to
    broadcast outright.
    """
    f = with_salt(facts, n_salts, "_salt")
    d = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("_salt", F.col("_salt").cast("int"))
    out = f.join(d, [on, "_salt"], how)
    return out.drop("_salt")
