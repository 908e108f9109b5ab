"""Plan-quality audit: for every registry query, inspect the physical
plan and report the features that matter at scale — join strategies,
shuffle (Exchange) count, Expand presence, whole-stage codegen spans,
and whether parquet scans carry pushed filters / pruned schemas.

Usage: python tools/explain_audit.py [sf_dir] [query ...]

This is evidence + regression tooling, not a benchmark: a query that
silently flips from broadcast to sort-merge join, or grows an Expand,
shows up here before it shows up in bench numbers.
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from movie_data_pipeline_spark.plans.analytics import QUERIES  # noqa: E402
from movie_data_pipeline_spark.session import get_spark  # noqa: E402


def audit_plan(plan: str) -> dict[str, object]:
    return {
        "bhj": len(re.findall(r"BroadcastHashJoin", plan)),
        "smj": len(re.findall(r"SortMergeJoin", plan)),
        "bnlj": len(re.findall(r"BroadcastNestedLoopJoin", plan)),
        "exchanges": len(re.findall(r"Exchange (?:hashpartitioning|rangepartitioning|RoundRobinPartitioning|SinglePartition)", plan)),
        "expand": len(re.findall(r"\bExpand\b", plan)),
        "codegen_spans": len(set(re.findall(r"\*\((\d+)\)", plan))),
        "scans": len(re.findall(r"Scan parquet", plan)),
        # scans whose PushedFilters list is non-empty (filterless full
        # scans legitimately push nothing). NOTE: "Scan parquet" counts
        # include the descriptive child plans inside InMemoryRelation —
        # a high scan count beside a cache count is narration, not I/O.
        "pushed": len(re.findall(r"PushedFilters: \[[^\]]", plan)),
        "cached": len(re.findall(r"InMemoryTableScan", plan)),
        "python_eval": len(
            re.findall(r"ArrowEvalPython|BatchEvalPython|MapInPandas|FlatMapGroupsInPandas", plan)
        ),
    }


# An explicit F.broadcast() hint bypasses autoBroadcastJoinThreshold, so
# an O(corpus) build side never fails planning — it fails the driver at
# scale. Catch it from runtime evidence: any BroadcastExchange whose
# numOutputRows exceeds this at the audit SF is corpus-shaped, not
# dim-shaped (dims here are ≤ ~2k rows at sf0.01; facts are ≥ 15k).
BCAST_WORRY_ROWS = 10_000


def broadcast_row_counts(node) -> list[int]:
    """numOutputRows of every BroadcastExchange in an EXECUTED plan,
    descending through AQE and query-stage wrappers."""
    out: list[int] = []
    name = node.getClass().getSimpleName()
    if "BroadcastExchange" in name:
        try:
            opt = node.metrics().get("numOutputRows")
            if opt.isDefined():
                out.append(opt.get().value())
        except Exception:  # noqa: BLE001
            pass
    try:
        if name == "AdaptiveSparkPlanExec":
            return out + broadcast_row_counts(node.executedPlan())
        if "QueryStage" in name:
            return out + broadcast_row_counts(node.plan())
    except Exception:  # noqa: BLE001
        pass
    it = node.children().iterator()
    while it.hasNext():
        out.extend(broadcast_row_counts(it.next()))
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark("explain_audit")
    header = (
        f"{'query':32s} {'BHJ':>3s} {'SMJ':>3s} {'BNLJ':>4s} {'xchg':>4s} "
        f"{'expd':>4s} {'wscg':>4s} {'scan':>4s} {'push':>4s} {'py':>3s} "
        f"{'cach':>4s} {'bcast':>7s}"
    )
    print(header)
    print("-" * len(header))
    worries = []
    for name, (builder, _) in QUERIES.items():
        if only and name not in only:
            continue
        try:
            df = builder(spark, sf_dir)
            # execute via collect() on the df's OWN QueryExecution: a
            # noop-sink write runs a separate QE, leaving this one's
            # AQE rewrites un-finalized and its metrics at zero. Only
            # the executed instance tells the truth (isFinalPlan=true
            # and live numOutputRows on every BroadcastExchange).
            df.collect()
            qe = df._jdf.queryExecution()
            plan = qe.executedPlan().toString()
            a = audit_plan(plan)
            bcast = broadcast_row_counts(qe.executedPlan())
            a["bcast_max"] = max(bcast) if bcast else 0
            spark.catalog.clearCache()
        except Exception as exc:  # noqa: BLE001
            print(f"{name:32s} ERROR: {exc}")
            worries.append((name, "error"))
            continue
        print(
            f"{name:32s} {a['bhj']:3d} {a['smj']:3d} {a['bnlj']:4d} "
            f"{a['exchanges']:4d} {a['expand']:4d} {a['codegen_spans']:4d} "
            f"{a['scans']:4d} {a['pushed']:4d} {a['python_eval']:3d} "
            f"{a['cached']:4d} {a['bcast_max']:7d}"
        )
        if a["smj"] > 0:
            worries.append((name, f"{a['smj']} sort-merge join(s)"))
        if a["expand"] > 0:
            worries.append((name, f"{a['expand']} Expand node(s)"))
        if a["bcast_max"] > BCAST_WORRY_ROWS:
            worries.append(
                (name, f"O(corpus)-sized broadcast: {a['bcast_max']} rows")
            )
    if worries:
        print("\nworth a look (SMJ may be fine for fact-to-fact; Expand is"
              " expected for cube/rollup/multi-distinct):")
        for name, why in worries:
            print(f"  {name}: {why}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
