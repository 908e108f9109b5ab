"""Scale stress for the curation family: build a K× documents corpus
from sf0.1 (each copy deterministically suffixed so copies are
near- but not exact duplicates, plus the original kept verbatim so
exact-dup machinery still has work), then time each curation operator
at 1× and K×.

As with stress_dedup.py / stress_ann.py, the point is the growth
CURVE, not the absolute numbers: every operator here is a
single-scan + bounded-shuffle shape (charlm collapses gram instances
to counts map-side and broadcasts a vocabulary-bounded model;
decontamination shuffles hashed n-grams only, with the bench side
broadcast; repetition stats move counts, never text; the leakage
split is one keyed window + one agg), so wall time must grow
≈linearly in corpus size and driver memory must stay flat — the
driver never holds corpus-sized state. Run:

    python tools/stress_curation.py [K]

Writes nothing outside /tmp.
"""

from __future__ import annotations

import resource
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from movie_data_pipeline_spark.plans.curation import (  # noqa: E402
    bpe_doc_tokens,
    charlm_doc_scores,
    decontaminate_docs,
    doc_repetition_stats,
    leakage_safe_split,
)
from movie_data_pipeline_spark.session import clear_state, get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"


def driver_rss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def timed(label: str, build) -> float:
    """Times plan BUILD + action together: operators that materialize
    eagerly inside the builder (charlm's scoped persist/checkpoint)
    must not escape the clock."""
    t0 = time.perf_counter()
    n = build().count()
    dt = time.perf_counter() - t0
    print(f"  {label:28s} {dt:7.2f}s  ({n} result rows)")
    return dt


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark("stress_curation")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n = docs.count()
    big_docs = docs.crossJoin(
        F.broadcast(spark.range(k).select(F.col("id").alias("copy")))
    ).select(
        (F.col("doc_id") + F.col("copy") * n).alias("doc_id"),
        "lang",
        "source",
        # copy 0 is the verbatim original; copies i>0 get a distinct
        # suffix, so they are near-dups (decontamination / repetition
        # still fire) without collapsing under the exact-dup hash
        F.when(F.col("copy") == 0, F.col("text"))
        .otherwise(
            F.concat(F.col("text"), F.lit(" c"), F.col("copy").cast("string"))
        )
        .alias("text"),
    )
    big_path = "/tmp/stress_docs_curation"
    big_docs.write.mode("overwrite").parquet(big_path + "/documents.parquet")
    print(f"corpus: {n} -> {n * k} documents (K={k})\n")

    # warm-up: JVM, codegen, and the Python worker pool — the 1×
    # numbers must not absorb session startup or the ratios lie low
    charlm_doc_scores(spark, SF_DIR).count()
    clear_state(spark)

    ops = [
        ("charlm_doc_scores", charlm_doc_scores),
        ("decontaminate_docs", decontaminate_docs),
        ("doc_repetition_stats", doc_repetition_stats),
        ("leakage_safe_split", leakage_safe_split),
        # BPE: the 10x corpus re-trains (fresh cache key) — the claim
        # under test is that training cost rides the VOCABULARY, so
        # only the initial word-count scan should grow with corpus
        ("bpe_doc_tokens", bpe_doc_tokens),
    ]
    results: dict[str, tuple[float, float]] = {}
    for label, sf_dir in [("1x", SF_DIR), (f"{k}x", big_path)]:
        print(f"[{label}]  driver max-RSS so far: {driver_rss_mb():.0f} MB")
        for name, fn in ops:
            dt = timed(name, lambda fn=fn, d=sf_dir: fn(spark, d))
            results.setdefault(name, [0.0, 0.0])[label != "1x"] = dt
            clear_state(spark)
        print()

    print(f"driver max-RSS at end: {driver_rss_mb():.0f} MB")
    print(f"\n{'operator':28s} {'1x':>8s} {k:>7d}x {'ratio':>7s}")
    for name, (t1, tk) in results.items():
        print(f"{name:28s} {t1:7.2f}s {tk:7.2f}s {tk / t1:6.1f}x")


if __name__ == "__main__":
    main()
