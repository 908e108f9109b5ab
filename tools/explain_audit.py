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


def broadcast_metrics(node, skip_bnlj: bool = False, parent: str = "") -> list[tuple[int, int]]:
    """(numOutputRows, dataSize bytes) of every BroadcastExchange in an
    EXECUTED plan, descending through AQE and query-stage wrappers.
    With ``skip_bnlj``, exchanges whose direct consumer is a
    BroadcastNestedLoopJoin are EXCLUDED: Spark must broadcast one
    side of a cross/non-equi join regardless of
    autoBroadcastJoinThreshold, so in the threshold=-1 attribution run
    those exchanges are forced by the JOIN TYPE, not by a hint, and
    counting them would blame hints for broadcasts no hint caused.

    Interpretation: an AQE/CBO-chosen broadcast is bounded by
    autoBroadcastJoinThreshold by construction and flips to a shuffle
    join at scale — adaptive behavior working as intended, even when
    the build side is a corpus-derived key projection at a tiny test
    SF. Only a broadcast whose dataSize EXCEEDS the threshold can have
    come from an explicit hint on an unbounded relation — the true
    driver-OOM-at-scale signature (round 1's BM25 lengths table)."""
    out: list[tuple[int, int]] = []
    name = node.getClass().getSimpleName()
    if "BroadcastExchange" in name and not (
        skip_bnlj and "BroadcastNestedLoopJoin" in parent
    ):
        try:
            m = node.metrics()
            rows = m.get("numOutputRows")
            size = m.get("dataSize")
            out.append(
                (
                    rows.get().value() if rows.isDefined() else -1,
                    size.get().value() if size.isDefined() else -1,
                )
            )
        except Exception:  # noqa: BLE001
            pass
    try:
        if name == "AdaptiveSparkPlanExec":
            return out + broadcast_metrics(node.executedPlan(), skip_bnlj, parent)
        if "QueryStage" in name:
            return out + broadcast_metrics(node.plan(), skip_bnlj, parent)
    except Exception:  # noqa: BLE001
        pass
    it = node.children().iterator()
    while it.hasNext():
        out.extend(broadcast_metrics(it.next(), skip_bnlj, name))
    return out


BCAST_WORRY_ROWS = 10_000


def hinted_broadcast_max(spark, builder, sf_dir: str) -> int:
    """Max numOutputRows across broadcasts that come from EXPLICIT
    F.broadcast() hints, measured exactly: re-execute the query with
    autoBroadcastJoinThreshold=-1 (static AND adaptive), which turns
    off every optimizer/AQE-chosen broadcast — any BroadcastExchange
    still in the executed plan was forced by a ResolvedHint. This is
    the attribution the r6 verdict asked for: a 58k-row broadcast that
    AQE chose (reversible at scale) no longer masks or mimics a 58k-row
    broadcast a hint forced (irreversible — the true OOM-at-scale
    signature)."""
    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
        )
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        df = builder(spark, sf_dir)
        df.collect()
        # skip_bnlj: cross/non-equi joins broadcast regardless of the
        # -1 threshold (the join TYPE forces it), so those exchanges
        # must not be attributed to hints
        bcast = broadcast_metrics(
            df._jdf.queryExecution().executedPlan(), skip_bnlj=True
        )
        return max((r for r, _ in bcast), default=0)
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
        spark.catalog.clearCache()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark("explain_audit")
    header = (
        f"{'query':32s} {'BHJ':>3s} {'SMJ':>3s} {'BNLJ':>4s} {'xchg':>4s} "
        f"{'expd':>4s} {'wscg':>4s} {'scan':>4s} {'push':>4s} {'py':>3s} "
        f"{'cach':>4s} {'bcast':>7s} {'bcastH':>7s} {'hint':>4s}"
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
            bcast = broadcast_metrics(qe.executedPlan())
            a["bcast_max"] = max((r for r, _ in bcast), default=0)
            a["hints"] = qe.analyzed().toString().count("ResolvedHint")
            spark.catalog.clearCache()
            # exact hinted-vs-AQE attribution (second execution with
            # optimizer broadcasts disabled) — only when hints exist.
            a["bcast_hinted"] = (
                hinted_broadcast_max(spark, builder, sf_dir)
                if a["hints"] > 0
                else 0
            )
        except Exception as exc:  # noqa: BLE001
            print(f"{name:32s} ERROR: {exc}")
            worries.append((name, "error"))
            continue
        print(
            f"{name:32s} {a['bhj']:3d} {a['smj']:3d} {a['bnlj']:4d} "
            f"{a['exchanges']:4d} {a['expand']:4d} {a['codegen_spans']:4d} "
            f"{a['scans']:4d} {a['pushed']:4d} {a['python_eval']:3d} "
            f"{a['cached']:4d} {a['bcast_max']:7d} {a['bcast_hinted']:7d} "
            f"{a['hints']:4d}"
        )
        if a["smj"] > 0:
            worries.append((name, f"{a['smj']} sort-merge join(s)"))
        if a["expand"] > 0:
            worries.append((name, f"{a['expand']} Expand node(s)"))
        # An AQE/CBO-chosen broadcast is bounded by
        # autoBroadcastJoinThreshold and flips to a shuffle join at
        # scale — adaptive behavior working as intended. An EXPLICIT
        # F.broadcast() hint bypasses that bound forever. bcast_hinted
        # isolates the hinted exchanges exactly (see
        # hinted_broadcast_max), so an AQE-chosen corpus-sized
        # broadcast next to a 1-row hinted side no longer false-flags.
        if a["bcast_hinted"] > BCAST_WORRY_ROWS:
            worries.append(
                (
                    name,
                    f"EXPLICIT hint forces a {a['bcast_hinted']}-row "
                    f"broadcast — verify the hinted side is bounded",
                )
            )
    if worries:
        print("\nworth a look (SMJ may be fine for fact-to-fact; Expand is"
              " expected for cube/rollup/multi-distinct):")
        for name, why in worries:
            print(f"  {name}: {why}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
