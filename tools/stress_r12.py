"""Scale stress for the round-12 gaps (r11 VERDICT item 6 + item 3):
the two round-11 entries that landed after stress_r11 —
``ams_skew_profile`` and ``null_key_order_ranks`` — plus the new
``chunk_docs_sentences`` UDTF entry, 1x vs Kx warehouse under /tmp.

1. ``ams_skew_profile`` — Kx lineitem rows (disjoint orderkeys, SAME
   part/supp key domains so per-key frequencies — and therefore F2 —
   grow quadratically while the sketch pass stays one linear scan).
   The curve must be ≈linear in rows: the sketch never materializes
   per-key state, and the r12 merge rework keeps every aggregation
   buffer O(reps) (posexplode → groupBy(idx)), not
   O(arrow_batches * reps). The F2 bound gate re-runs at Kx.

2. ``null_key_order_ranks`` — Kx urgent orders: the NULL bucket grows
   Kx too (every 7th key), stressing the dedicated lowest-bucket path
   of the rank decomposition alongside the non-NULL buckets.

3. ``chunk_docs_sentences`` — Kx documents: the greedy sentence
   packer is embarrassingly parallel per document; the curve must be
   ≈linear with zero exchanges before the presentation sort.

Driver max-RSS printed alongside (must stay flat). Run:

    python tools/stress_r12.py [K]

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
TMP = "/tmp/stress_r12"


def driver_rss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def build_warehouse(spark, k: int) -> str:
    copies = F.broadcast(spark.range(k).select(F.col("id").alias("copy")))

    # lineitem: disjoint orderkeys, SAME l_partkey/l_suppkey domains —
    # per-key frequency grows Kx, F2 grows ~K^2x, rows grow Kx
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    mo = li.agg(F.max("l_orderkey")).collect()[0][0] + 1
    (
        li.crossJoin(copies)
        .withColumn("l_orderkey", F.col("l_orderkey") + F.col("copy") * mo)
        .drop("copy")
        .write.mode("overwrite")
        .parquet(f"{TMP}/lineitem.parquet")
    )

    # orders: disjoint orderkeys, keep priority mix — the urgent slice
    # (and its every-7th-key NULL injection) grows Kx
    od = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    (
        od.crossJoin(copies)
        .withColumn("o_orderkey", F.col("o_orderkey") + F.col("copy") * mo)
        .drop("copy")
        .write.mode("overwrite")
        .parquet(f"{TMP}/orders.parquet")
    )

    # documents: disjoint doc_ids, same text distribution
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    md = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    (
        docs.crossJoin(copies)
        .select(
            (F.col("doc_id") + F.col("copy") * md).alias("doc_id"),
            "text", "lang", "source", "n_chars",
        )
        .write.mode("overwrite")
        .parquet(f"{TMP}/documents.parquet")
    )

    # events: ams_moment_check's join-size side
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    me = ev.agg(F.max("event_id")).collect()[0][0] + 1
    (
        ev.crossJoin(copies)
        .withColumn("event_id", F.col("event_id") + F.col("copy") * me)
        .drop("copy")
        .write.mode("overwrite")
        .parquet(f"{TMP}/events.parquet")
    )
    return TMP


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    print(f"load1={os.getloadavg()[0]:.2f} cpus={os.cpu_count()}")
    spark = get_spark("stress_r12")
    big = build_warehouse(spark, k)
    print(f"warehouse: lineitem/orders/documents/events at {k}x\n")
    clear_state(spark)

    from movie_data_pipeline_spark.plans.analytics import QUERIES

    entries = [
        ("ams_skew_profile", QUERIES["ams_skew_profile"][0]),
        ("null_key_order_ranks", QUERIES["null_key_order_ranks"][0]),
        ("chunk_docs_sentences", QUERIES["chunk_docs_sentences"][0]),
    ]
    results: dict[str, list[float]] = {}
    for label, sf_dir, idx in [("1x", SF_DIR, 0), (f"{k}x", big, 1)]:
        print(f"[{label}]  driver max-RSS so far: {driver_rss_mb():.0f} MB")
        for name, builder in entries:
            builder(spark, sf_dir).count()  # warm codegen/footers
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

    # the AMS gate on the grown warehouse: both bounds must still hold
    # (F2 grew ~K^2; the estimator's relative bound is scale-free)
    from movie_data_pipeline_spark.plans.analytics_ext16 import ams_moment_check

    r = ams_moment_check(spark, big).collect()[0]
    ok = r["f2_within_bound"] and r["join_within_bound"]
    print(f"ams_moment_check at {k}x: "
          f"{'ALL BOUNDS HOLD' if ok else f'VIOLATION: {r.asDict()}'}")

    print(f"driver max-RSS at end: {driver_rss_mb():.0f} MB")
    print(f"\n{'operator':26s} {'1x':>8s} {k:>7d}x {'ratio':>7s}")
    for name, (t1, tk) in results.items():
        print(f"{name:26s} {t1:7.2f}s {tk:7.2f}s {tk / t1:6.1f}x")


if __name__ == "__main__":
    raise SystemExit(main())
