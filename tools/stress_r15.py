"""r15 streaming-cache measurement: per-trigger probe-input cost with
the mtime-keyed index-partition cache vs the old whole-root re-read.

Builds a minhash index of K batch_id partitions (sf0.01 documents
split round-robin), then times, per simulated trigger, constructing
the probe's `prior` relation and draining it through a noop count —
(a) old way: spark.read.parquet(root).filter(batch_id != N), (b) new
way: streaming.docs._cached_index_parts. Interleaved A/B, min-of-N.

Usage: python tools/stress_r15.py [sf_dir] [n_parts] [reps]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from bench import read_proc_stat  # noqa: E402
from movie_data_pipeline_spark.operators.dedup import minhash_index  # noqa: E402
from movie_data_pipeline_spark.session import get_spark  # noqa: E402
from movie_data_pipeline_spark.streaming import docs as SD  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n_parts = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 6
    steal0, busy0 = read_proc_stat()
    spark = get_spark("stress_r15")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
        "doc_id", "text"
    )
    root = tempfile.mkdtemp(prefix="probe_lat_index_")
    for i in range(n_parts):
        minhash_index(docs.filter(F.col("doc_id") % n_parts == i)).write.parquet(
            os.path.join(root, f"batch_id={i}")
        )

    def old_prior():
        return (
            spark.read.parquet(root)
            .filter(F.col("batch_id") != F.lit(n_parts))
            .select("doc_id", "sh", "bands")
        )

    def new_prior():
        return SD._cached_index_parts(spark, root, exclude_batch_id=n_parts)

    # warm both (footer caches, codegen, first cache fill)
    old_prior().write.format("noop").mode("overwrite").save()
    new_prior().write.format("noop").mode("overwrite").save()

    olds, news = [], []
    for _ in range(reps):
        t0 = time.perf_counter()
        old_prior().write.format("noop").mode("overwrite").save()
        olds.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        new_prior().write.format("noop").mode("overwrite").save()
        news.append(time.perf_counter() - t0)
    # equality of the probe input
    n_old = old_prior().count()
    n_new = new_prior().count()
    assert n_old == n_new, (n_old, n_new)
    steal1, busy1 = read_proc_stat()
    out = {
        "sf_dir": sf_dir,
        "n_parts": n_parts,
        "reps": reps,
        "rows": n_old,
        "old_per_trigger": [round(x, 4) for x in olds],
        "new_per_trigger": [round(x, 4) for x in news],
        "old_min": round(min(olds), 4),
        "new_min": round(min(news), 4),
        "ratio": round(min(news) / min(olds), 3),
        "steal_pct_busy": round(
            (steal1 - steal0) / max(busy1 - busy0, 1) * 100, 2
        ),
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
