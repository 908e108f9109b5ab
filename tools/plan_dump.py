"""Dump `.explain("formatted")` for named registry queries to
plans/r14/<query>_<tag>.txt — the optimization round's before/after
plan evidence (the judge checks plan claims against these files).

Usage: python tools/plan_dump.py <tag> <query> [query ...]
       python tools/plan_dump.py <tag> --file <name-list-file>

Runs at the canonical bench scale ($SPARK_GRAFT_SF_DIR, default
/root/testdata/sf0.1) so plan shapes (AQE thresholds, broadcast
decisions recorded in the INITIAL plan) match what the bench times.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from movie_data_pipeline_spark.plans.analytics import QUERIES  # noqa: E402
from movie_data_pipeline_spark.session import clear_state, get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    if names and names[0] == "--file":
        names = Path(names[1]).read_text().split()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = REPO / "plans" / os.environ.get("PLAN_DUMP_ROUND", "r15")
    out_dir.mkdir(parents=True, exist_ok=True)
    spark = get_spark("plan_dump")
    for name in names:
        builder, _ = QUERIES[name]
        df = builder(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        (out_dir / f"{name}_{tag}.txt").write_text(plan)
        clear_state(spark)
        print(f"wrote {out_dir.relative_to(REPO)}/{name}_{tag}.txt"
              f" ({len(plan)} chars)")


if __name__ == "__main__":
    main()
