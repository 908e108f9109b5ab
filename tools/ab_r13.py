"""Idle-machine interleaved A/B for the two r12→r13 watch items
(VERDICT r12 item 1): `dsir_importance_weights` (1.86 s at the r11
close → 3.0–3.2 s in every later window, byte-identical code AND
testdata — the only ×1.6 mover between two CLEAN windows) and
`cube_lineitem` (1.04 → 1.24–1.74 s). dsir additionally A/Bs the
round-13 presentation-sort conversion: the OLD variant (trailing
global .orderBy, loaded verbatim from git HEAD) re-executes its
entire md5-heavy upstream once more for range-boundary sampling; the
NEW variant ends in sortWithinPartitions.

Discipline (BASELINE.md r5-bisect): interleave variants ABAB...,
min-of-N per variant, noop sink, clear_state between runs, loadavg +
whole-run /proc/stat steal recorded. Run with NOTHING else on the box.

NOTE: the "old" dsir variant loads ext6 from git HEAD, which at
experiment time (pre-commit working tree vs HEAD) still carried the
global orderBy. After the r13 conversion commit the two variants are
byte-identical — the measured table lives in BASELINE.md round-13;
re-running this script today A/Bs dsir against itself plus the
controls, which still measures in-window variance.

Usage: python tools/ab_r13.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from bench import read_proc_stat  # noqa: E402
from movie_data_pipeline_spark.session import clear_state, get_spark  # noqa: E402


def _load_head_ext6():
    """Import the pre-conversion ext6 (trailing global orderBy) from
    git HEAD as a sibling module so its relative imports resolve."""
    src = subprocess.run(
        ["git", "-C", str(REPO), "show",
         "HEAD:movie_data_pipeline_spark/plans/analytics_ext6.py"],
        capture_output=True, text=True, check=True,
    ).stdout
    tmp = REPO / "movie_data_pipeline_spark" / "plans" / "_ab_head_ext6.py"
    tmp.write_text(src)
    try:
        import importlib

        return importlib.import_module(
            "movie_data_pipeline_spark.plans._ab_head_ext6"
        )
    finally:
        tmp.unlink(missing_ok=True)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    load_start = round(os.getloadavg()[0], 2)
    steal0, busy0 = read_proc_stat()

    head_ext6 = _load_head_ext6()
    from movie_data_pipeline_spark.plans.analytics import QUERIES

    variants = {
        "dsir_old_orderby": head_ext6.dsir_importance_weights,
        "dsir_new_swp": QUERIES["dsir_importance_weights"][0],
        "cube_lineitem": QUERIES["cube_lineitem"][0],
        "ctl_q1_top_part": QUERIES["q1_top_part"][0],
        "ctl_doc_repetition": QUERIES["doc_repetition_stats"][0],
    }

    spark = get_spark("ab_r13")

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
