"""Scale stress for the round-11 entries: KMV sketch overlap and the
chunking twins, 1x vs Kx warehouse under /tmp.

1. ``kmv_priority_overlap`` — Kx orders with a GROWING distinct
   custkey domain (custkey + copy * max_custkey), the regime where a
   sketch earns its keep: the exact pairwise overlap's self-join grows
   with the key domain, the sketch build pays one distinct shuffle and
   the overlap stage stays O(groups^2 * k) FLAT. The curve must be
   ≈linear (the distinct shuffle) with a constant overlap tail.
   ``kmv_overlap_check`` re-runs at Kx: the error-bound booleans must
   hold on the grown domain too (k=512 saturated 10x deeper).

2. ``chunk_docs_udtf`` (Arrow UDTF; the registry's `chunk_docs` entry
   until r12) vs the native plan (now THE `chunk_docs` entry)
   (split→sequence→transform→posexplode) — the A/B behind registering
   the native twin: the r11 clean bench read the Arrow UDTF at 1.53 s
   vs the r9 pickled path's 0.63 s at sf0.1, so both formulations are
   timed at both scales to show where the Python boundary's per-batch
   conversion cost sits as data grows.

Driver max-RSS printed alongside (must stay flat). Run:

    python tools/stress_r11.py [K]

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
TMP = "/tmp/stress_r11"


def driver_rss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def build_warehouse(spark, k: int) -> str:
    copies = F.broadcast(spark.range(k).select(F.col("id").alias("copy")))

    # orders: growing custkey domain — each copy introduces k-1 new
    # distinct customers per original, so distinct(custkey) grows Kx
    # while the 5-priority group domain stays fixed (the hot-group
    # shape the salt tournament exists for)
    od = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_orderpriority"
    )
    mo = od.agg(F.max("o_orderkey")).collect()[0][0] + 1
    mc = od.agg(F.max("o_custkey")).collect()[0][0] + 1
    (
        od.crossJoin(copies)
        .select(
            (F.col("o_orderkey") + F.col("copy") * mo).alias("o_orderkey"),
            (F.col("o_custkey") + F.col("copy") * mc).alias("o_custkey"),
            "o_orderpriority",
        )
        .write.mode("overwrite")
        .parquet(f"{TMP}/orders.parquet")
    )

    # documents: disjoint doc_ids, same text distribution — chunk
    # output rows grow Kx
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
    return TMP


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    print(f"load1={os.getloadavg()[0]:.2f} cpus={os.cpu_count()}")
    spark = get_spark("stress_r11")
    big = build_warehouse(spark, k)
    print(f"warehouse: orders/documents at {k}x\n")
    clear_state(spark)

    from movie_data_pipeline_spark.plans.analytics import QUERIES
    # round 12: chunk_docs now IS the native plan; the UDTF twin moved
    # out of the registry (plans/analytics_ext3.py) — import directly
    from movie_data_pipeline_spark.plans.analytics_ext3 import chunk_docs_udtf

    entries = [
        ("kmv_priority_overlap", QUERIES["kmv_priority_overlap"][0]),
        ("chunk_docs_udtf (Arrow UDTF)", chunk_docs_udtf),
        ("chunk_docs (native)", QUERIES["chunk_docs"][0]),
    ]
    results: dict[str, list[float]] = {}
    for label, sf_dir, idx in [("1x", SF_DIR, 0), (f"{k}x", big, 1)]:
        print(f"[{label}]  driver max-RSS so far: {driver_rss_mb():.0f} MB")
        dk = (
            spark.read.parquet(f"{sf_dir}/orders.parquet")
            .select("o_custkey").distinct().count()
        )
        print(f"  distinct custkeys (sketch key domain): {dk}")
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

    # the gate itself on the grown domain: every bound must still hold
    from movie_data_pipeline_spark.plans.analytics_ext16 import kmv_overlap_check

    bad = [
        r.asDict()
        for r in kmv_overlap_check(spark, big).collect()
        if not (r["distinct_in_bound"] and r["union_in_bound"] and r["inter_in_bound"])
    ]
    print(f"kmv_overlap_check at {k}x: "
          f"{'ALL BOUNDS HOLD' if not bad else f'VIOLATIONS: {bad}'}")

    print(f"driver max-RSS at end: {driver_rss_mb():.0f} MB")
    print(f"\n{'operator':26s} {'1x':>8s} {k:>7d}x {'ratio':>7s}")
    for name, (t1, tk) in results.items():
        print(f"{name:26s} {t1:7.2f}s {tk:7.2f}s {tk / t1:6.1f}x")


if __name__ == "__main__":
    raise SystemExit(main())
