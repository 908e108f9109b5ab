"""Scale stress for the round-10 entries (r10 verdict item 4): build a
K× warehouse under /tmp and time each at 1× vs K×.

1. ``nearest_click_gap`` — as-of NEAREST with ±2h tolerance. The
   events copies are SKEW-PRESERVING (same user_id, ts shifted by
   copy × 92 days) so every user's purchase/click streams genuinely
   grow K×; the 92-day shift keeps the ±2h tolerance from matching
   across copies. The operator is the union + one-keyed-window
   merge-join formulation (two in-partition sorts over ONE shuffle),
   so the curve must be ≈linear — a candidate-pair formulation would
   bend quadratic in the per-user stream length.

2. ``q21_bottleneck_suppliers`` — the whole-partition-window
   formulation shipped in the registry, A/B'd against the
   aggregate-plus-join-back rewrite at both scales (the two plans the
   round-10 VERDICT asked to see compared where it matters). Copies
   shift order keys, so per-order groups keep their 1× width and only
   the group COUNT grows — the realistic 100 TB shape (an order does
   not gain lineitems when the warehouse grows). The observability
   row prints the max lineitems-per-order: the window partition
   width, i.e. the quantity that decides whether a whole-partition
   window is safe (bounded width) or a skew hazard.

Driver max-RSS printed alongside (must stay flat). Run:

    python tools/stress_r10.py [K]

Writes nothing outside /tmp.
"""

from __future__ import annotations

import os
import resource
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from movie_data_pipeline_spark.session import clear_state, get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
TMP = "/tmp/stress_r10"


def driver_rss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def build_warehouse(spark, k: int) -> str:
    copies = F.broadcast(spark.range(k).select(F.col("id").alias("copy")))

    # events: skew-preserving (same recipe as stress_r9) — same
    # user_id, ts shifted 92 days per copy, disjoint event_ids
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    me = ev.agg(F.max("event_id")).collect()[0][0] + 1
    ts_type = dict(ev.dtypes)["ts"]
    if ts_type == "bigint":  # raw nanos variant of the driver data
        shifted = (
            F.col("ts") + F.col("copy") * F.lit(92 * 86400 * 1_000_000_000)
        ).alias("ts")
    else:
        shifted = F.expr(
            "timestampadd(MICROSECOND, copy * 7948800000000, ts)"
        ).alias("ts")
    (
        ev.crossJoin(copies)
        .select(
            (F.col("event_id") + F.col("copy") * me).alias("event_id"),
            shifted, "user_id", "event_type", "value", "props",
        )
        .write.mode("overwrite").parquet(f"{TMP}/events.parquet")
    )

    # lineitem/orders: shifted order keys — per-order groups keep
    # their 1× width, the group count grows K×; suppliers are shared
    # (the dim does not grow when the fact grows)
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    od = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        "o_orderkey", "o_orderstatus"
    )
    mo = od.agg(F.max("o_orderkey")).collect()[0][0] + 1
    (
        li.crossJoin(copies)
        .select(
            (F.col("l_orderkey") + F.col("copy") * mo).alias("l_orderkey"),
            "l_suppkey", "l_shipdate",
        )
        .write.mode("overwrite").parquet(f"{TMP}/lineitem.parquet")
    )
    (
        od.crossJoin(copies)
        .select(
            (F.col("o_orderkey") + F.col("copy") * mo).alias("o_orderkey"),
            "o_orderstatus",
        )
        .write.mode("overwrite").parquet(f"{TMP}/orders.parquet")
    )
    spark.read.parquet(f"{SF_DIR}/supplier.parquet").write.mode(
        "overwrite"
    ).parquet(f"{TMP}/supplier.parquet")
    return TMP


def q21_aggregate_join_back(spark, sf_dir: str):
    """The rewrite's ALTERNATIVE: per-order aggregate (max shipdate,
    supplier count, suppliers-at-max count) joined back to the
    filtered fact — more exchanges than the whole-partition window
    but no per-order sort. Semantically identical; the A/B shows
    which plan wins at which scale."""
    from movie_data_pipeline_spark.sources.catalog import load_table

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    finished = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select(F.col("o_orderkey").alias("l_orderkey"))
    f = li.join(finished, "l_orderkey")
    per_order = f.groupBy("l_orderkey").agg(
        F.max("l_shipdate").alias("mx"),
        F.size(F.collect_set("l_suppkey")).alias("nsupp"),
    )
    at_max = (
        f.join(per_order, "l_orderkey")
        .filter(F.col("l_shipdate") == F.col("mx"))
        .groupBy("l_orderkey")
        .agg(
            F.size(F.collect_set("l_suppkey")).alias("nmax"),
            F.max("l_suppkey").alias("the_supp"),
        )
    )
    qual = (
        per_order.join(at_max, "l_orderkey")
        .filter((F.col("nsupp") >= 2) & (F.col("nmax") == 1))
        .select("l_orderkey", F.col("the_supp").alias("l_suppkey"))
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name"
    )
    return (
        qual.join(supp, qual.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("long").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    print(f"load1={os.getloadavg()[0]:.2f} cpus={os.cpu_count()}")
    spark = get_spark("stress_r10")
    big = build_warehouse(spark, k)
    print(f"warehouse: events/lineitem/orders/supplier at {k}x\n")
    clear_state(spark)

    from movie_data_pipeline_spark.plans.analytics import QUERIES

    entries = [
        ("nearest_click_gap", QUERIES["nearest_click_gap"][0]),
        ("q21_window (registry)", QUERIES["q21_bottleneck_suppliers"][0]),
        ("q21_agg_join_back", q21_aggregate_join_back),
    ]
    results: dict[str, list[float]] = {}
    for label, sf_dir, idx in [("1x", SF_DIR, 0), (f"{k}x", big, 1)]:
        print(f"[{label}]  driver max-RSS so far: {driver_rss_mb():.0f} MB")
        # observability: the window partition width for q21 — max
        # lineitems per finished order (must NOT grow with K for the
        # whole-partition window to stay safe)
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        wmax = (
            li.groupBy("l_orderkey").count().agg(F.max("count")).collect()
        )[0][0]
        print(f"  max lineitems/order (window partition width): {wmax}")
        for name, builder in entries:
            # warm once (codegen/footers), then time min-of-2
            builder(spark, sf_dir).count()
            clear_state(spark)
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                n = builder(spark, sf_dir).count()
                best = min(best, time.perf_counter() - t0)
                clear_state(spark)
            results.setdefault(name, [0.0, 0.0])[idx] = best
            print(f"  {name:26s} {best:7.2f}s  ({n} rows)")
        print()

    print(f"driver max-RSS at end: {driver_rss_mb():.0f} MB")
    print(f"\n{'operator':26s} {'1x':>8s} {k:>7d}x {'ratio':>7s}")
    for name, (t1, tk) in results.items():
        print(f"{name:26s} {t1:7.2f}s {tk:7.2f}s {tk / t1:6.1f}x")


if __name__ == "__main__":
    raise SystemExit(main())
