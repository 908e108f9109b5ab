"""Idle-machine interleaved A/B for the r13→r14 watch item (VERDICT
r13 item 2): `semantic_dedup_docs` moved 2.64 → 3.86 s (+46%)
anchor→close — the only >40% clean-chain mover — on code whose only
r13 touch was in SIBLING entries. Hypotheses: (a) ambient (the family
has documented ±40-80% swings, r7/r8); (b) the entry's own trailing
global `.orderBy("doc_id")` — it was NOT converted by the r13
presentation-sort sweep despite a corpus-scale drop-list output, and
the range-boundary sampling pass can re-execute the IVF
cluster-self-join upstream.

Variants: the shipped entry (global orderBy), the convention form
(sortWithinPartitions), a no-trailing-sort form (isolates the sort's
whole cost), and two controls from different cost families.

Discipline (BASELINE.md r5-bisect): interleave ABAB..., min-of-N per
variant, noop sink, clear_state between runs, loadavg + whole-run
/proc/stat steal recorded. Run with NOTHING else on the box.

Usage: python tools/ab_r14.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from bench import read_proc_stat  # noqa: E402
from movie_data_pipeline_spark.session import clear_state, get_spark  # noqa: E402


def _semantic(spark, sf_dir, sort: str):
    from movie_data_pipeline_spark.operators.similarity import (
        get_ivf_centroids,
        semantic_dedup,
        sqrt_nlist,
    )
    from movie_data_pipeline_spark.sources.catalog import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    nlist = sqrt_nlist(emb, cache_key=sf_dir, mult=2)
    centroids = get_ivf_centroids(emb, sf_dir, nlist=nlist)
    out = semantic_dedup(emb, centroids, threshold=0.45)
    if sort == "orderby":
        return out.orderBy("doc_id")
    if sort == "swp":
        return out.sortWithinPartitions("doc_id")
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    load_start = round(os.getloadavg()[0], 2)
    steal0, busy0 = read_proc_stat()

    from movie_data_pipeline_spark.plans.analytics import QUERIES

    variants = {
        "semantic_orderby": lambda s, d: _semantic(s, d, "orderby"),
        "semantic_swp": lambda s, d: _semantic(s, d, "swp"),
        "semantic_nosort": lambda s, d: _semantic(s, d, "none"),
        "ctl_q1_top_part": QUERIES["q1_top_part"][0],
        "ctl_doc_repetition": QUERIES["doc_repetition_stats"][0],
    }

    spark = get_spark("ab_r14")

    def run(builder) -> float:
        t0 = time.perf_counter()
        builder(spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        clear_state(spark)
        return dt

    for b in variants.values():  # untimed warm-up pass
        run(b)

    samples: dict[str, list[float]] = {k: [] for k in variants}
    for _ in range(reps):
        for k, b in variants.items():
            samples[k].append(run(b))

    steal1, busy1 = read_proc_stat()
    steal_pct = round((steal1 - steal0) / max(busy1 - busy0, 1) * 100, 2)
    print(f"\nload1 start={load_start} end={round(os.getloadavg()[0], 2)} "
          f"steal_pct_busy={steal_pct} cpus={os.cpu_count()}")
    for k, v in samples.items():
        print(f"{k:20s} min={min(v):.3f}s samples={[round(x, 3) for x in v]}")


if __name__ == "__main__":
    main()
