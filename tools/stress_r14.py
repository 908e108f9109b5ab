"""Round-14 scale stress: (1) growth curves for the round's new
operators (ext20 exact_span_dedup + drop_dup_sentences_docs, ext21
bloom_decontaminate_docs) at 1x (sf0.1) and Kx — all should track
rows ~linearly: the span pipeline shuffles only 24-byte
(k, doc_id, gs) triples, the sentence rewrite moves text exactly
once, and the Bloom probe is k positions per gram against a
broadcast bitmap; (2) the source_template_prefix LCP curve
(r13 VERDICT item 4 / ADVICE item 3): the old formulation compared
every prefix length (O(L^2) char work per source row), the new one
binary-searches it (O(L log L)) — time both on synthetic single-source
corpora with a shared prefix of growing length L and show the old
curve blow up quadratically while the new one stays flat.

Reuses stress_r12's warehouse builder (Kx documents under /tmp). Run:

    python tools/stress_r14.py [K]
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


def _lcp_frames(spark, length: int, n_docs: int = 50):
    """Single-source corpus whose docs share a prefix of ~`length`
    chars: MIN/MAX land on the common prefix boundary, so the LCP
    work is exactly `length`-deep."""
    prefix = ("lorem " * (length // 6 + 1))[:length]
    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit(prefix), F.lit(" tail "), F.col("id").cast("string")
        ).alias("text"),
        F.lit("one_source").alias("source"),
        F.lit("en").alias("lang"),
    )


def _lcp_agg(docs):
    headed = docs.select(
        "source",
        F.concat(
            F.lit("["), F.col("source"), F.lit(" header] "), F.col("text")
        ).alias("t"),
    )
    return headed.groupBy("source").agg(
        F.min("t").alias("lo"), F.max("t").alias("hi")
    )


def lcp_old(docs):
    """The pre-r14 formulation: size(filter(sequence(1, n))) — one
    substr-equality per prefix LENGTH, O(L^2) char compares."""
    agg = _lcp_agg(docs)
    n = F.least(F.length("lo"), F.length("hi"))
    lcp = F.size(
        F.filter(
            F.sequence(F.lit(1), n),
            lambda i: F.col("lo").substr(F.lit(1), i)
            == F.col("hi").substr(F.lit(1), i),
        )
    )
    return agg.select("source", lcp.alias("plen"))


def lcp_new(docs):
    """The SHIPPED binary search — imported from ext19, not copied,
    so this tool can never measure a stale formulation."""
    from movie_data_pipeline_spark.plans.analytics_ext19 import lcp_expr

    agg = _lcp_agg(docs)
    return agg.select(
        "source", lcp_expr(F.col("lo"), F.col("hi")).alias("plen")
    )


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    print(f"load1={os.getloadavg()[0]:.2f} cpus={os.cpu_count()}")
    spark = get_spark("stress_r14")

    # --- (2) LCP curve: old O(L^2) vs new O(L log L) ----------------
    print(f"{'prefix chars':>12s} {'old (s)':>9s} {'new (s)':>9s}  agree")
    for length in (1_000, 4_000, 16_000, 64_000):
        docs = _lcp_frames(spark, length)
        docs.persist().count()
        vals = {}
        times = {}
        for name, fn in (("old", lcp_old), ("new", lcp_new)):
            fn(docs).collect()  # warm
            t0 = time.perf_counter()
            vals[name] = fn(docs).collect()[0]["plen"]
            times[name] = time.perf_counter() - t0
        docs.unpersist()
        agree = vals["old"] == vals["new"]
        print(
            f"{length:12d} {times['old']:9.3f} {times['new']:9.3f}  "
            f"{agree} (plen={vals['new']})"
        )
        assert agree, (vals, length)

    # --- (1) ext20 growth curves ------------------------------------
    big = build_warehouse(spark, k)
    print(f"\nwarehouse at {k}x under {big}")
    clear_state(spark)

    from movie_data_pipeline_spark.plans.analytics_ext20 import (
        drop_dup_sentences_docs,
        exact_span_dedup,
    )
    from movie_data_pipeline_spark.plans.analytics_ext21 import (
        bloom_decontaminate_docs,
    )
    from movie_data_pipeline_spark.plans.analytics_ext22 import (
        cms_part_frequencies,
    )

    results: dict[str, list[float]] = {}
    for label, sf_dir, idx in [("1x", SF_DIR, 0), (f"{k}x", big, 1)]:
        print(f"[{label}]  driver max-RSS so far: {driver_rss_mb():.0f} MB")
        for name, builder in (
            ("exact_span_dedup", exact_span_dedup),
            ("drop_dup_sentences_docs", drop_dup_sentences_docs),
            ("bloom_decontaminate_docs", bloom_decontaminate_docs),
            ("cms_part_frequencies", cms_part_frequencies),
        ):
            best, n = timed(spark, builder, sf_dir)
            results.setdefault(name, [0.0, 0.0])[idx] = best
            print(f"  {name:26s} {best:7.2f}s  ({n} rows)")

    print(f"\ndriver max-RSS at end: {driver_rss_mb():.0f} MB")
    print(f"\n{'operator':26s} {'1x':>8s} {k:>7d}x {'ratio':>7s}")
    for name, (t1, tk) in results.items():
        print(f"{name:26s} {t1:7.2f}s {tk:7.2f}s {tk / t1:6.1f}x")


if __name__ == "__main__":
    main()
