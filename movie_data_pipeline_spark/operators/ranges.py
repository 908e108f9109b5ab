"""Interval (range) join — the second temporal-join operator the
reference lacks (SURVEY §2.3: no as-of/range joins anywhere in the
workload; ``operators/asof.py`` covers the nearest-row case). A range
join answers CONTAINMENT: for each point row, every interval row of
the same key whose [start, end) spans the point's timestamp — ad
attribution windows, maintenance windows, SCD2 validity, session
containment. Unlike the as-of join, intervals may OVERLAP, so a point
can match many intervals and the union+window trick does not apply.

Spark-first design: Spark's optimizer turns ``t1.ts BETWEEN t2.s AND
t2.e`` into a broadcast-nested-loop or cartesian-with-filter — O(n·m)
per key and a scale killer. The standard distributed formulation is
BINNING: quantize time into fixed-width bins, explode each interval to
the bins it overlaps, give each point its single containing bin, and
equi-join on (key, bin) — Catalyst then plans an ordinary shuffled
hash/sort-merge join on a compound key. The exact predicate filters
bin-level false positives. Because a point owns exactly ONE bin and an
interval is exploded to every bin it touches AT MOST ONCE, a true
(point, interval) pair meets in exactly one bin — no post-join dedup.

Cost model (the knob that matters at 100 TB): each interval costs
``len/bin_width + 1`` exploded rows, each point exactly 1 — pick
``bin_width`` near the typical interval length so fan-out stays O(1)
per interval while bins stay selective. Pathologically long intervals
(a "whole-year campaign") degrade gracefully into many bin rows —
salt-like spreading, not a cross join — and AQE's skew-join split
handles a hot (key, bin).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: Sequence[str],
    point_ts: str,
    start_col: str,
    end_col: str,
    bin_width: int,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row with the same ``on``
    key and ``start <= ts < end`` (half-open, the convention that makes
    adjacent intervals partition time with no double-count).

    ``point_ts``/``start_col``/``end_col`` must share one integral
    unit (e.g. epoch-µs longs); ``bin_width`` is in that unit and must
    be positive. Output columns: every ``points`` column, then every
    non-key ``intervals`` column (name-collisions on the interval side
    get an ``ivl_`` prefix). ``how="left"`` also keeps points with no
    containing interval, interval side NULL.
    """
    if bin_width <= 0:
        raise ValueError(f"bin_width must be positive, got {bin_width}")
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    on = list(on)

    def bin_of(c: Column) -> Column:
        return F.floor(c / F.lit(bin_width)).cast("long")

    p = points.withColumn("_bin", bin_of(F.col(point_ts)))
    rename = {
        c: f"ivl_{c}" if c in points.columns else c
        for c in intervals.columns
        if c not in on
    }
    iv = intervals.select(
        *on,
        *[F.col(c).alias(a) for c, a in rename.items()],
    )
    s, e = rename[start_col], rename[end_col]
    # drop empty intervals BEFORE exploding: sequence(a, b) with b < a
    # would descend and fabricate bins; with end > start guaranteed,
    # bin_of(end−1) ≥ bin_of(start) and the sequence ascends
    iv = iv.filter(F.col(e) > F.col(s)).withColumn(
        "_bin",
        F.explode(
            F.sequence(
                bin_of(F.col(s)),
                # end is exclusive: an interval ending exactly on a bin
                # boundary does not reach into that bin
                bin_of(F.col(e) - F.lit(1)),
            )
        ),
    )
    pred = (F.col(point_ts) >= F.col(s)) & (F.col(point_ts) < F.col(e))
    if how == "inner":
        return p.join(iv, [*on, "_bin"], "inner").filter(pred).drop("_bin")
    # left: tag each point row so duplicates on the point side survive
    # the unmatched-row recovery (anti-join by tag, not by value)
    p2 = p.withColumn("_pid", F.monotonically_increasing_id())
    matched = p2.join(iv, [*on, "_bin"], "inner").filter(pred)
    unmatched = p2.join(
        matched.select("_pid").distinct(), "_pid", "left_anti"
    ).select(
        "*",
        *[
            F.lit(None).cast(iv.schema[c].dataType).alias(c)
            for c in rename.values()
        ],
    )
    return matched.unionByName(unmatched).drop("_bin", "_pid")
