"""Idle-machine A/B: r6 HITS (single edge checkpoint, per-round join
shuffles) vs r7 HITS (src- and dst-keyed edge checkpoints, claimed
exchange-free round joins) — the r7 verdict graded the rework WEAK
because the bench wall went 8.09 -> 9.54 s across the change while
byte-identical queries drifted the same direction (ambient-load
suspicion, unprovable for changed code).

Discipline (BASELINE.md r5-bisect): interleave the variants ABAB...,
min-of-N per variant, noop sink, clear_state between every run, record
loadavg before/after so the run is machine-flagged. Run with NOTHING
else on the box.

Usage: python tools/ab_hits.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from movie_data_pipeline_spark.operators.graph import hits as hits_r7  # noqa: E402
from movie_data_pipeline_spark.plans.graphs import _trade_edges  # noqa: E402
from movie_data_pipeline_spark.session import clear_state, get_spark  # noqa: E402


def hits_r6(edges: DataFrame, src: str = "src", dst: str = "dst",
            n_iter: int = 10) -> DataFrame:
    """Verbatim r6 shape (commit 5cfde94): ONE unpartitioned edge
    checkpoint; every round's two joins shuffle the edge relation on
    the join key."""
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .distinct()
        .localCheckpoint()
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    hub = nodes.select("node", F.lit(1.0).alias("hub"))
    auth = nodes.select("node", F.lit(1.0).alias("authority"))

    def _l2_normalize(df: DataFrame, col: str) -> DataFrame:
        norm = df.agg(F.sqrt(F.sum(F.col(col) * F.col(col))).alias("_n"))
        return (
            df.crossJoin(F.broadcast(norm))
            .select("node", (F.col(col) / F.col("_n")).alias(col))
        )

    for _ in range(n_iter):
        auth = (
            e.join(hub, e.src == hub.node)
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("hub").alias("authority"))
        )
        auth = _l2_normalize(auth, "authority").localCheckpoint()
        hub = (
            e.join(auth, e.dst == auth.node)
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum("authority").alias("hub"))
        )
        hub = _l2_normalize(hub, "hub").localCheckpoint()
    return (
        nodes.join(hub, "node", "left")
        .join(auth, "node", "left")
        .select(
            "node",
            F.coalesce("hub", F.lit(0.0)).alias("hub"),
            F.coalesce("authority", F.lit(0.0)).alias("authority"),
        )
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    load_start = round(os.getloadavg()[0], 2)
    spark = get_spark("ab_hits")

    def run(variant) -> float:
        t0 = time.perf_counter()
        variant(_trade_edges(spark, sf_dir)).orderBy("node").write.format(
            "noop"
        ).mode("overwrite").save()
        dt = time.perf_counter() - t0
        clear_state(spark)
        return dt

    # untimed warm-up of both variants (codegen, parquet footers)
    run(hits_r6)
    run(hits_r7)

    samples: dict[str, list[float]] = {"r6": [], "r7": []}
    for _ in range(reps):
        samples["r6"].append(run(hits_r6))
        samples["r7"].append(run(hits_r7))

    load_end = round(os.getloadavg()[0], 2)
    print(f"\nload1 start={load_start} end={load_end} cpus={os.cpu_count()}")
    for k, v in samples.items():
        print(f"{k}: min={min(v):.2f}s  samples={[round(x, 2) for x in v]}")
    print(f"delta (r7 - r6) of mins: {min(samples['r7']) - min(samples['r6']):+.2f}s")


if __name__ == "__main__":
    main()
