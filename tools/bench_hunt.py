"""Idle-window hunter for the full sf0.1 bench (round-10 VERDICT item 1).

Seven round-10 full-bench attempts over ~5 h all self-labeled
contaminated — the box steals cycles in waves that a single pre-launch
loadavg check cannot see coming. This wrapper automates the hunt:

  1. gate on 1-min loadavg (cheap, catches the obvious),
  2. probe BOTH contamination sentinels (bench.SENTINELS: the short
     scan+agg q17 and the iterative trade_kcore) min-of-3 in a fresh
     Spark process and require each inside its documented idle band,
  3. only then launch ``python bench.py`` (which still self-labels and
     diverts a contaminated run — the probe reduces wasted 15-minute
     attempts, it does not replace the in-run steal detector),
  4. on a clean artifact, optionally ``git commit`` BENCH_FULL.json;
     otherwise sleep and retry until the deadline.

Usage: python tools/bench_hunt.py [--deadline-min N] [--sleep-sec S]
                                  [--commit] [--once]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

# Idle bands for THIS probe's methodology (fresh 2-query process,
# clear_state between reruns), NOT the committed in-bench readings
# (q17 = 0.37 s / trade_kcore = 1.71 s come from a warmed long-lived
# session ~100 queries in; a fresh process pays file-listing + codegen
# setup every run). Calibrated 2026-08-16 on an idle box (load1 0.2,
# 6 reps): q17 0.75-0.96 s, trade_kcore 1.78-2.3 s (min-of-3).
PROBE_BANDS = {
    "q17_small_qty_revenue": (0.40, 1.10),
    "trade_kcore": (1.30, 2.80),
}
LOAD1_GATE = 0.8
# Hypervisor-steal gate (round 12): steal only manifests while the
# GUEST is busy, so an idle loadavg says nothing about host
# contention — the r12 forensics measured 11-13% steal DURING runs
# that launched at load1 0.1-0.2. Spin all cores briefly and measure
# the /proc/stat steal fraction; above this, a bench would come back
# uniformly inflated even though every legacy gate passes.
STEAL_GATE_PCT = 3.0


def steal_probe(seconds: float = 3.0) -> float:
    """%% of busy jiffies stolen while spinning every core for
    ``seconds`` — the host-contention signal loadavg cannot see."""
    import multiprocessing as mp

    def read():
        v = list(map(int, open("/proc/stat").readline().split()[1:]))
        steal = v[7] if len(v) > 7 else 0
        return steal, sum(v) - v[3] - (v[4] if len(v) > 4 else 0)

    def spin(sec: float) -> None:
        t0 = time.time()
        x = 0
        while time.time() - t0 < sec:
            x += 1

    s0, b0 = read()
    procs = [
        mp.Process(target=spin, args=(seconds,))
        for _ in range(os.cpu_count() or 1)
    ]
    for p in procs:
        p.start()
    for p in procs:
        p.join()
    s1, b1 = read()
    return (s1 - s0) / max(b1 - b0, 1) * 100.0

_PROBE_SNIPPET = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from movie_data_pipeline_spark.plans.analytics import QUERIES
from movie_data_pipeline_spark.session import clear_state, get_spark
spark = get_spark("bench_probe")
sf_dir = "/root/testdata/sf0.1"
out = {{}}
for name in {names!r}:
    builder, _ = QUERIES[name]
    builder(spark, sf_dir).write.format("noop").mode("overwrite").save()
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        builder(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
        clear_state(spark)
    out[name] = round(best, 4)
print("PROBE_RESULT " + json.dumps(out))
"""


def run_probe() -> dict[str, float] | None:
    """Min-of-3 sentinel timings in a fresh process; None on error."""
    code = _PROBE_SNIPPET.format(repo=str(REPO), names=list(PROBE_BANDS))
    try:
        res = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True, text=True, timeout=600, cwd=REPO,
        )
    except subprocess.TimeoutExpired:
        return None
    for line in res.stdout.splitlines():
        if line.startswith("PROBE_RESULT "):
            return json.loads(line[len("PROBE_RESULT "):])
    return None


def probe_verdict(timings: dict[str, float] | None) -> str:
    if not timings:
        return "probe failed"
    bad = [
        f"{n}={t}s (band {lo}-{hi})"
        for n, (lo, hi) in PROBE_BANDS.items()
        for t in [timings.get(n)]
        if t is None or not (lo <= t <= hi)
    ]
    return "; ".join(bad) if bad else "ok"


def artifact_state() -> tuple[bool, str]:
    """(clean_and_fresh, description) for BENCH_FULL.json."""
    path = REPO / "BENCH_FULL.json"
    try:
        data = json.loads(path.read_text())
    except (OSError, ValueError) as exc:
        return False, f"unreadable: {exc}"
    load = data.get("load", {})
    n = len(data.get("queries", {}))
    desc = (
        f"{n} queries, total {data.get('total_sec')}s, "
        f"load1_start {load.get('load1_start')}, "
        f"steal {load.get('steal_pct_busy')}%, "
        f"calib {load.get('calib_sec')}s, "
        f"contaminated={load.get('contaminated')}"
    )
    return not load.get("contaminated", True), desc


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--deadline-min", type=float, default=240.0)
    ap.add_argument("--sleep-sec", type=float, default=240.0)
    ap.add_argument("--commit", action="store_true")
    ap.add_argument("--once", action="store_true")
    args = ap.parse_args()

    deadline = time.time() + args.deadline_min * 60
    attempt = 0
    before_mtime = None
    full = REPO / "BENCH_FULL.json"
    if full.exists():
        before_mtime = full.stat().st_mtime

    while time.time() < deadline:
        attempt += 1
        load1 = os.getloadavg()[0]
        stamp = time.strftime("%H:%M:%S")
        if load1 > LOAD1_GATE:
            print(f"[{stamp}] attempt {attempt}: load1={load1:.2f} "
                  f"> {LOAD1_GATE}, sleeping", flush=True)
        elif (steal := steal_probe()) > STEAL_GATE_PCT:
            print(f"[{stamp}] attempt {attempt}: steal={steal:.1f}% "
                  f"> {STEAL_GATE_PCT}% (host contention), sleeping",
                  flush=True)
        else:
            probe = run_probe()
            verdict = probe_verdict(probe)
            print(f"[{stamp}] attempt {attempt}: load1={load1:.2f}, "
                  f"probe={probe} -> {verdict}", flush=True)
            if verdict == "ok":
                # The probes themselves inflate loadavg (the steal
                # probe spins every core; the sentinel probe runs a
                # fresh Spark session) — launching immediately hands
                # bench.py a load1_start of ~6 and a self-inflicted
                # contaminated_load divert (observed live 12:42,
                # r12). Wait for OUR OWN load to decay first — and
                # require TWO consecutive sub-gate readings >= 10 s
                # apart: the kernel folds the run queue into loadavg
                # on ~5 s ticks, so a single reading taken between
                # ticks can show 0.7 while the very next tick jumps
                # to 3+ from the probe spin (observed live 18:50,
                # r13: hunter read 0.71, bench.py read 3.22 seconds
                # later and a fully-clean 17-minute run diverted).
                decay_deadline = time.time() + 300
                consecutive_ok = 0
                while consecutive_ok < 2 and time.time() < decay_deadline:
                    if os.getloadavg()[0] <= LOAD1_GATE:
                        consecutive_ok += 1
                    else:
                        consecutive_ok = 0
                    time.sleep(10)
                if os.getloadavg()[0] > 2.0:  # bench's own divert gate
                    print(f"[{stamp}] load1 {os.getloadavg()[0]:.2f} "
                          f"never decayed (another tenant?) — retrying",
                          flush=True)
                    if args.once:
                        return 1
                    time.sleep(args.sleep_sec)
                    continue
                print(f"[{stamp}] launching full bench "
                      f"(load1 {os.getloadavg()[0]:.2f} after decay wait)",
                      flush=True)
                res = subprocess.run(
                    [sys.executable, "bench.py"],
                    cwd=REPO, capture_output=True, text=True, timeout=3600,
                )
                tail = res.stdout.strip().splitlines()
                print(tail[-1][:300] if tail else "(no output)", flush=True)
                clean, desc = artifact_state()
                changed = (
                    full.exists()
                    and full.stat().st_mtime != before_mtime
                )
                if clean and changed:
                    print(f"SUCCESS: clean BENCH_FULL.json ({desc})",
                          flush=True)
                    if args.commit:
                        subprocess.run(
                            ["git", "add", "BENCH_FULL.json"], cwd=REPO
                        )
                        subprocess.run(
                            ["git", "commit", "-m",
                             "Commit clean full-registry sf0.1 bench "
                             "artifact (idle-window hunt)"],
                            cwd=REPO,
                        )
                    return 0
                print(f"bench run diverted (artifact: {desc}); retrying",
                      flush=True)
        if args.once:
            return 1
        time.sleep(args.sleep_sec)
    print("deadline reached without a clean run", flush=True)
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
