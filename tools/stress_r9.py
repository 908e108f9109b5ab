"""Scale stress for the round-9 families (r9 verdict item 2): build a
K× warehouse under /tmp and time each family at 1× vs K×. Unlike the
earlier stress scripts, the events copies here are SKEW-PRESERVING:
every copy keeps its original user_id with the timestamp shifted by
copy × 92 days, so each user's keyed window partition genuinely grows
K× (disjoint 7-day ranges, no daily-preagg collapse) — the honest
test for the keyed RANGE frame and the keyed lag.

What each curve must show:

1. ``user_rolling_7d_value`` — daily pre-agg (linear) + per-user
   RANGE frame whose partitions grew K× ⇒ ≈linear (the frame itself
   stays ≤7 days wide).
2. ``event_type_transitions`` — keyed lag over (user, ts) ⇒ ≈linear.
3. ``value_percentile_grid_by_type`` / ``price_quartiles_exact`` —
   grouped/global rank passes on the adaptive bucket split ⇒
   ≈linear; their LAST_SPLIT_STATS are printed (r9 verdict item 4:
   the split is load-bearing and must be SEEN re-splitting, not
   inferred from wall time).
4. ``heaps_law_fit`` — tokenize (linear) + one global rank + an
   8-point threshold semi-join ⇒ ≈linear.
5. ``gopher_quality_flags`` / ``tokenizer_fertility_by_lang`` —
   single scans with per-row token arithmetic ⇒ ≈linear.
6. ``incremental_daily_rollup`` — the IVM merge; timed against an
   inline full recompute of the same rollup to show the merge adds
   only month-cardinality work on top of the two partial scans.

Driver max-RSS printed alongside (must stay flat). Run:

    python tools/stress_r9.py [K]

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
from tools.stress_dedup import perturbed_copies  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
TMP = "/tmp/stress_r9"

DOC_QUERIES = ["heaps_law_fit", "gopher_quality_flags",
               "tokenizer_fertility_by_lang"]
EVENT_QUERIES = ["user_rolling_7d_value", "event_type_transitions",
                 "value_percentile_grid_by_type"]
RANK_CONSUMERS = {"heaps_law_fit", "price_quartiles_exact",
                  "value_percentile_grid_by_type"}


def driver_rss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def build_warehouse(spark, k: int) -> str:
    # documents: perturbed near-dup copies with lang re-attached
    # (same recipe as stress_r7's warehouse)
    docs_full = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    docs = docs_full.select("doc_id", "text")
    n_docs = docs.count()
    meta = docs_full.select(
        F.col("doc_id").alias("orig_id"), "lang", "source"
    )
    (
        perturbed_copies(docs, k)
        .withColumn("orig_id", F.col("doc_id") % n_docs)
        .join(meta, "orig_id")
        .select("doc_id", "text", "lang", "source")
        .write.mode("overwrite")
        .parquet(f"{TMP}/documents.parquet")
    )

    # events: SKEW-PRESERVING copies — same user_id, ts shifted by
    # copy × 92 days so per-user partitions grow K× without the
    # 7-day frames overlapping across copies
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    me = ev.agg(F.max("event_id")).collect()[0][0] + 1
    copies = F.broadcast(spark.range(k).select(F.col("id").alias("copy")))
    shift_us = F.col("copy") * F.lit(92 * 86400 * 1_000_000)
    ts_type = dict(ev.dtypes)["ts"]
    if ts_type == "bigint":  # raw nanos variant of the driver data
        shifted = (F.col("ts") + shift_us * 1000).alias("ts")
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

    # lineitem/orders: only the columns the round-9 entries read
    # (price_quartiles_exact: l_extendedprice; incremental_daily_
    # rollup: o_orderkey/o_totalprice/o_orderdate) — column pruning
    # means the full-width tables would add only disk, not signal
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_extendedprice"
    )
    (
        li.crossJoin(copies)
        .select(
            "l_orderkey",
            (F.col("l_extendedprice") + F.col("copy") * 0.01).alias(
                "l_extendedprice"
            ),
        )
        .write.mode("overwrite").parquet(f"{TMP}/lineitem.parquet")
    )
    od = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        "o_orderkey", "o_totalprice", "o_orderdate"
    )
    mo = od.agg(F.max("o_orderkey")).collect()[0][0] + 1
    (
        od.crossJoin(copies)
        .select(
            (F.col("o_orderkey") + F.col("copy") * mo).alias("o_orderkey"),
            "o_totalprice", "o_orderdate",
        )
        .write.mode("overwrite").parquet(f"{TMP}/orders.parquet")
    )
    return TMP


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    print(f"load1={os.getloadavg()[0]:.2f} cpus={os.cpu_count()}")
    spark = get_spark("stress_r9")
    big = build_warehouse(spark, k)
    print(f"warehouse: documents/events/lineitem/orders at {k}x\n")
    clear_state(spark)

    from movie_data_pipeline_spark.operators.ranks import LAST_SPLIT_STATS
    from movie_data_pipeline_spark.plans.analytics import QUERIES
    from movie_data_pipeline_spark.plans.analytics_ext13 import (
        incremental_daily_rollup,
    )

    names = DOC_QUERIES + EVENT_QUERIES + [
        "price_quartiles_exact", "incremental_daily_rollup",
    ]
    results: dict[str, list[float]] = {}
    for label, sf_dir, idx in [("1x", SF_DIR, 0), (f"{k}x", big, 1)]:
        print(f"[{label}]  driver max-RSS so far: {driver_rss_mb():.0f} MB")
        for name in names:
            builder, _ = QUERIES[name]
            t0 = time.perf_counter()
            n = builder(spark, sf_dir).count()
            dt = time.perf_counter() - t0
            results.setdefault(name, [0.0, 0.0])[idx] = dt
            print(f"  {name:30s} {dt:7.2f}s  ({n} rows)")
            if name in RANK_CONSUMERS and LAST_SPLIT_STATS:
                print(
                    f"    split: levels={LAST_SPLIT_STATS.get('levels')} "
                    f"final_max_width="
                    f"{LAST_SPLIT_STATS.get('final_max_width')}"
                )
            clear_state(spark)
        # IVM merge vs full recompute: the same rollup over ALL
        # orders in one pass — the merge path must not cost more
        # than a constant over it
        t0 = time.perf_counter()
        full = (
            spark.read.parquet(f"{sf_dir}/orders.parquet")
            .groupBy(
                (
                    F.year("o_orderdate") * 100 + F.month("o_orderdate")
                ).alias("ym")
            )
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.sum(
                    F.col("o_totalprice").cast("decimal(30,2)")
                ).alias("rev"),
            )
            .count()
        )
        dt = time.perf_counter() - t0
        results.setdefault("(full_recompute_rollup)", [0.0, 0.0])[idx] = dt
        print(f"  {'(full_recompute_rollup)':30s} {dt:7.2f}s  ({full} rows)")
        clear_state(spark)
        print()

    print(f"driver max-RSS at end: {driver_rss_mb():.0f} MB")
    print(f"\n{'operator':30s} {'1x':>8s} {k:>7d}x {'ratio':>7s}")
    for name, (t1, tk) in results.items():
        print(f"{name:30s} {t1:7.2f}s {tk:7.2f}s {tk / t1:6.1f}x")
    _ = incremental_daily_rollup  # imported for the IVM family link


if __name__ == "__main__":
    main()
