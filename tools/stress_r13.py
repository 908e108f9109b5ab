"""Round-13 scale stress: (1) decompose ``chunk_docs_sentences``'s
wall (r12 VERDICT item 5 — 2.5 s at sf0.1, the steepest r12 10x curve
at 6.5x) into sentence-injection scan, Arrow UDTF boundary, and
presentation sort — measuring the r13 conversion (global ORDER BY →
sortWithinPartitions) directly at 1x and 10x; (2) re-run the AMS
growth/bound checks under the NEW 4-wise polynomial sign family
(r12 VERDICT item 6), whose per-row numpy cost is higher than the old
bit-unpack — the curve must stay ≈linear in rows and both
``ams_moment_check`` bounds must hold at 10x.

Reuses stress_r12's warehouse builder (Kx lineitem/orders/documents/
events under /tmp). Run:

    python tools/stress_r13.py [K]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from movie_data_pipeline_spark.session import clear_state, get_spark  # noqa: E402
from tools.stress_r12 import SF_DIR, build_warehouse, driver_rss_mb  # noqa: E402


def chunk_variants(spark):
    """Named sub-plans of chunk_docs_sentences for cost attribution."""
    from movie_data_pipeline_spark.functions import chunking
    from movie_data_pipeline_spark.plans.analytics_ext17 import (
        _BUDGET,
        _OVERLAP,
        _sentenced,
        chunk_docs_sentences,
    )
    from movie_data_pipeline_spark.sources.catalog import load_table

    chunking.register(spark)

    def inject_only(spark, sf):
        return _sentenced(load_table(spark, sf, "documents"))

    def udtf_nosort(spark, sf):
        _sentenced(load_table(spark, sf, "documents")).createOrReplaceTempView(
            "stress_chunk_src"
        )
        return spark.sql(
            f"""
            SELECT d.doc_id, c.chunk_idx, c.chunk, c.chunk_tokens
            FROM stress_chunk_src d,
                 LATERAL chunk_sentences(d.sentenced, {_BUDGET}, {_OVERLAP}) c
            """
        )

    def udtf_global_sort(spark, sf):  # the pre-r13 entry shape
        return udtf_nosort(spark, sf).orderBy("doc_id", "chunk_idx")

    return [
        ("inject_only (scan+transform)", inject_only),
        ("udtf_nosort (Arrow boundary)", udtf_nosort),
        ("entry (sortWithinPartitions)", chunk_docs_sentences),
        ("udtf_global_sort (pre-r13)", udtf_global_sort),
    ]


def timed(spark, builder, sf_dir, reps: int = 2) -> tuple[float, int]:
    builder(spark, sf_dir).count()  # warm codegen/footers
    clear_state(spark)
    best, n = float("inf"), 0
    for _ in range(reps):
        t0 = time.perf_counter()
        n = builder(spark, sf_dir).count()
        best = min(best, time.perf_counter() - t0)
        clear_state(spark)
    return best, n


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    print(f"load1={os.getloadavg()[0]:.2f} cpus={os.cpu_count()}")
    spark = get_spark("stress_r13")
    big = build_warehouse(spark, k)
    print(f"warehouse at {k}x under {big}\n")
    clear_state(spark)

    from movie_data_pipeline_spark.plans.analytics import QUERIES

    results: dict[str, list[float]] = {}
    for label, sf_dir, idx in [("1x", SF_DIR, 0), (f"{k}x", big, 1)]:
        print(f"[{label}]  driver max-RSS so far: {driver_rss_mb():.0f} MB")
        for name, builder in chunk_variants(spark):
            best, n = timed(spark, builder, sf_dir)
            results.setdefault(name, [0.0, 0.0])[idx] = best
            print(f"  {name:32s} {best:7.2f}s  ({n} rows)")
        best, n = timed(spark, QUERIES["ams_skew_profile"][0], sf_dir)
        results.setdefault("ams_skew_profile (4-wise poly)", [0.0, 0.0])[idx] = best
        print(f"  {'ams_skew_profile (4-wise poly)':32s} {best:7.2f}s  ({n} rows)")
        print()

    from movie_data_pipeline_spark.plans.analytics_ext16 import ams_moment_check

    r = ams_moment_check(spark, big).collect()[0]
    ok = r["f2_within_bound"] and r["join_within_bound"]
    print(f"ams_moment_check at {k}x (4-wise poly signs): "
          f"{'ALL BOUNDS HOLD' if ok else f'VIOLATION: {r.asDict()}'}")

    print(f"driver max-RSS at end: {driver_rss_mb():.0f} MB")
    print(f"\n{'variant':32s} {'1x':>8s} {k:>7d}x {'ratio':>7s}")
    for name, (t1, tk) in results.items():
        print(f"{name:32s} {t1:7.2f}s {tk:7.2f}s {tk / t1:6.1f}x")


if __name__ == "__main__":
    raise SystemExit(main())
