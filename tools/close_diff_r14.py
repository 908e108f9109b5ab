"""Per-query diff of a round-close BENCH artifact against a baseline
artifact (default: the pre-optimization committed close preserved in
git), printing the optimization-touched entries first, then the
largest movers among shared keys — the evidence table for
OPTIMIZATION_r14.md / BASELINE.md.

Usage: python tools/close_diff_r14.py [after.json] [before.json]
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

TOUCHED = (
    "trade_pagerank", "trade_pagerank_weighted", "trade_ppr_nation0",
    "trade_hits", "trade_kcore", "trade_bfs_hops",
    "supplier_cotrade_triangles", "dsir_importance_weights",
    "repeated_ngram_spans", "dup_span_doc_stats", "exact_span_dedup",
    "drop_dup_sentences_docs", "dup_sentence_stats",
)


def load(path: str | None, git_ref: str | None = None) -> dict:
    if path:
        return json.loads(Path(path).read_text())
    out = subprocess.run(
        ["git", "-C", str(REPO), "show", f"{git_ref}:BENCH_FULL.json"],
        capture_output=True, text=True, check=True,
    ).stdout
    return json.loads(out)


def main() -> None:
    after = load(sys.argv[1] if len(sys.argv) > 1 else str(REPO / "BENCH_FULL.json"))
    if len(sys.argv) > 2:
        before = load(sys.argv[2])
    else:
        # the last commit that still carried the pre-optimization close
        before = load(None, git_ref="d6cb2bd~0")  # r13 verdict commit
        # prefer the r14-build close if present in history
        try:
            before = load(None, git_ref="1eed951")
        except subprocess.CalledProcessError:
            pass
    qa, qb = after["queries"], before["queries"]
    shared = sorted(set(qa) & set(qb))
    print(f"before total={before['total_sec']:.1f}s n={len(qb)}  "
          f"after total={after['total_sec']:.1f}s n={len(qa)}")
    la, lb = after.get("load", {}), before.get("load", {})
    print(f"before steal={lb.get('steal_pct_busy')}% suspects={lb.get('steal_suspects')}  "
          f"after steal={la.get('steal_pct_busy')}% suspects={la.get('steal_suspects')}")
    print("\ntouched entries:")
    tot_b = tot_a = 0.0
    for k in TOUCHED:
        if k in qa and k in qb:
            tot_b += qb[k]; tot_a += qa[k]
            print(f"  {k:28s} {qb[k]:6.2f} -> {qa[k]:6.2f}  x{qa[k]/qb[k]:.2f}")
    print(f"  {'TOUCHED SUM':28s} {tot_b:6.2f} -> {tot_a:6.2f}  x{tot_a/tot_b:.2f}")
    rest_b = sum(qb[k] for k in shared if k not in TOUCHED)
    rest_a = sum(qa[k] for k in shared if k not in TOUCHED)
    print(f"  {'UNTOUCHED SUM':28s} {rest_b:6.2f} -> {rest_a:6.2f}  x{rest_a/rest_b:.2f}")
    ratios = sorted(
        (qa[k] / qb[k], k) for k in shared if qb[k] >= 0.2
    )
    mid = len(ratios) // 2
    med = ratios[mid][0] if len(ratios) % 2 else (ratios[mid-1][0]+ratios[mid][0])/2
    print(f"\nshared>=0.2s median ratio: x{med:.3f} over {len(ratios)} keys")
    print("largest improvements:")
    for r, k in ratios[:8]:
        print(f"  x{r:.2f} {k} ({qb[k]:.2f} -> {qa[k]:.2f})")
    print("largest regressions:")
    for r, k in ratios[-8:]:
        print(f"  x{r:.2f} {k} ({qb[k]:.2f} -> {qa[k]:.2f})")


if __name__ == "__main__":
    main()
