"""As-of (temporal nearest) join — an operator the reference lacks
(SURVEY §2.3 notes no as-of/range joins anywhere in the workload) but a
time-series/training-data pipeline needs constantly: for each left row,
the latest right row at-or-before its timestamp (backward), the
earliest at-or-after (forward), or the temporally closest in either
direction (nearest), per key, optionally bounded by a tolerance.

Spark-first design: no built-in as-of join exists, so this composes one
from a UNION + window pass — both sides shuffle ONCE on the key, then a
per-key ordered scan carries the nearest right-side ROW forward as a
single struct with ``last(..., ignorenulls=True)``. That is the
merge-join formulation: O(n log n) per key for the sort, no candidate
explosion, no right-side broadcast needed, and it scales to arbitrarily
many left rows per key (unlike the join-then-rank formulation, which
materializes every (left, right) candidate pair before pruning — the
formulation the registry ORACLE deliberately uses, so every hash match
re-proves this one). ``nearest`` runs two window passes (ascending and
descending) over the same shuffle — one exchange, two in-partition
sorts — and resolves per row; ties in distance go BACKWARD.

The whole matched right row rides ONE struct (its event time plus the
requested value columns), so a right row whose value column is NULL is
still the match (earlier formulations carried each value column
independently through ignorenulls and could stitch values from
DIFFERENT right rows when some were NULL).

Tie semantics at equal timestamps: right rows sort BEFORE left rows in
both directions, so backward means <= and forward means >= (matching
DuckDB/pandas ``merge_asof`` defaults). Callers with multiple right
rows at the same (key, ts) should pre-dedup to make the winner
deterministic.
"""

from __future__ import annotations

from collections.abc import Sequence
from typing import Optional

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_INTEGRAL = ("tinyint", "smallint", "int", "bigint")


def _ts_long(df: DataFrame, col: str, who: str) -> Column:
    """Exact long image of a timestamp column for distance math.
    Integral columns pass through; timestamp/timestamp_ntz go through
    unix_micros (a bare cast('long') truncates to whole SECONDS, which
    would make nearest tie-resolution and tolerance silently operate
    at second granularity); dates become epoch days ×86400e6 via the
    same path. Fractional/string types raise — a truncating image
    would change which row is 'nearest' without any visible error."""
    dtype = dict(df.dtypes)[col]
    c = F.col(col)
    if dtype in _INTEGRAL:
        return c.cast("long")
    if dtype.startswith("timestamp") or dtype == "date":
        return F.unix_micros(c.cast("timestamp"))
    raise ValueError(
        f"asof_join: {who} column {col!r} has dtype {dtype!r}; use an "
        "integral epoch column or a timestamp/date type (fractional or "
        "string timestamps would truncate in the distance math)"
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    direction: str = "backward",
    tolerance: Optional[int] = None,
) -> DataFrame:
    """Left as-of join: every left row, plus ``value_cols`` from the
    temporally nearest right row per ``on`` key (NULLs when none
    qualifies). ``left_ts``/``right_ts`` must be mutually comparable
    (same unit — e.g. both epoch-µs longs, or both timestamp-typed).
    ``tolerance`` (inclusive) drops matches farther than that from the
    left timestamp; its unit is the ts columns' long image — the
    columns' own unit for integral epochs, MICROSECONDS for
    timestamp/date columns (which go through unix_micros, never a
    second-truncating cast). ``direction`` is ``backward`` (right
    at-or-before), ``forward`` (at-or-after) or ``nearest`` (closest
    of the two, backward wins exact-distance ties)."""
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction!r}"
        )
    if tolerance is not None and tolerance < 0:
        raise ValueError(f"tolerance must be >= 0, got {tolerance!r}")

    on = list(on)
    value_cols = list(value_cols)
    left_cols = left.columns

    r_struct = F.struct(
        _ts_long(right, right_ts, "right_ts").alias("_mts"), *value_cols
    )
    l2 = left.select(
        *on,
        F.col(left_ts).alias("_ts"),
        _ts_long(left, left_ts, "left_ts").alias("_tsl"),
        F.lit(1).alias("_side"),
        F.struct(*left_cols).alias("_l"),
        F.lit(None)
        .cast(right.select(r_struct).schema[0].dataType)
        .alias("_m"),
    )
    r2 = right.select(
        *on,
        F.col(right_ts).alias("_ts"),
        _ts_long(right, right_ts, "right_ts").alias("_tsl"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(l2.schema["_l"].dataType).alias("_l"),
        r_struct.alias("_m"),
    )
    both = l2.unionByName(r2)

    def carry(ts_order: Column) -> Column:
        w = (
            Window.partitionBy(*on)
            .orderBy(ts_order, F.asc("_side"))
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        return F.last("_m", ignorenulls=True).over(w)

    lts = F.col("_tsl")  # exact long image, built per-side above

    def within(m: Column, dist: Column) -> Column:
        ok = m.isNotNull()
        if tolerance is not None:
            ok = ok & (dist <= F.lit(int(tolerance)))
        return ok

    if direction == "nearest":
        mb = carry(F.asc("_ts"))
        mf = carry(F.desc("_ts"))
        db = lts - mb["_mts"]
        df_ = mf["_mts"] - lts
        b_ok = within(mb, db)
        f_ok = within(mf, df_)
        chosen = F.when(
            b_ok & (~F.coalesce(f_ok, F.lit(False)) | (db <= df_)), mb
        ).when(f_ok, mf)
    else:
        asc = direction == "backward"
        m = carry(F.asc("_ts") if asc else F.desc("_ts"))
        dist = (lts - m["_mts"]) if asc else (m["_mts"] - lts)
        chosen = F.when(within(m, dist), m)

    carried = both.select("*", chosen.alias("_match"))
    return carried.filter(F.col("_side") == 1).select(
        *[F.col(f"_l.{c}").alias(c) for c in left_cols],
        *[F.col(f"_match.{c}").alias(c) for c in value_cols],
    )
