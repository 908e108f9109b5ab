"""Scale stress for the round-8 families: K× documents/embeddings/
events (the stress_r7 warehouse) and time each at 1× vs K×.

What each curve must show:

1. ``repeated_ngram_spans`` / ``dup_span_doc_stats`` — the heavy
   shuffle moves 8-byte window hashes; only hash-hot windows
   re-shuffle as strings. The K× corpus is near-duplicate-rich
   (perturbed copies), so the DUPLICATED subset grows ~K× too — the
   honest expectation is ≈linear, not sublinear; what must NOT
   happen is the Σ df² blowup of a naive string group-by.
2. ``dsir_importance_weights`` — explode collapses to per-(doc,
   bucket) counts immediately; model stays 256 rows ⇒ ≈linear.
3. ``dedup_survivors`` — pair graph + CC + one window ⇒ tracks the
   near-dup pair count.
4. ``score_calibration_bins`` / ``score_pr_curve`` / ``score_auc`` —
   single scans (AUC adds one global sort) ⇒ ≈linear.

Driver max-RSS printed alongside (must stay flat). Run:

    python tools/stress_r8.py [K]

Writes nothing outside /tmp.
"""

from __future__ import annotations

import os
import resource
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from movie_data_pipeline_spark.session import clear_state, get_spark  # noqa: E402
from tools.stress_r7 import SF_DIR, build_warehouse  # noqa: E402


def driver_rss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    print(f"load1={os.getloadavg()[0]:.2f} cpus={os.cpu_count()}")
    spark = get_spark("stress_r8")
    big = build_warehouse(spark, k)
    print(f"warehouse: documents/embeddings/events at {k}x\n")
    clear_state(spark)

    from movie_data_pipeline_spark.plans.analytics import QUERIES

    names = [
        "repeated_ngram_spans", "dup_span_doc_stats",
        "dsir_importance_weights", "dedup_survivors",
        "score_calibration_bins", "score_pr_curve", "score_auc",
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
            print(f"  {name:28s} {dt:7.2f}s  ({n} rows)")
            clear_state(spark)
        print()

    print(f"driver max-RSS at end: {driver_rss_mb():.0f} MB")
    print(f"\n{'operator':28s} {'1x':>8s} {k:>7d}x {'ratio':>7s}")
    for name, (t1, tk) in results.items():
        print(f"{name:28s} {t1:7.2f}s {tk:7.2f}s {tk / t1:6.1f}x")


if __name__ == "__main__":
    main()
