#!/usr/bin/env python
"""Controlled A/B bench adjudication between two git refs (r10 verdict
#4): three rounds running, a per-query creep (q106 in r8-r10) was
explained by hand with ad-hoc /tmp scripts. This tool IS that manual
recipe, mechanized — given two refs and a query name it runs fresh
sessions, a warmup, and N timed runs per side, INTERLEAVED
(A,B,A,B,...) so ambient machine drift hits both sides equally, and
emits a one-line JSON verdict.

Each side runs in its own `git worktree` checkout and its own
subprocess (fresh JVM, fresh session — no cross-ref code or cache
leakage). Timing is the repo's own bench primitive
(plans.runner.run_benchmark, noop-sink materialization), so a bench_ab
number is directly comparable to BENCH_DETAIL's.

Usage:
    python tools/bench_ab.py --query q106_streaming_artifact_dedup \
        --ref-a <old-sha> --ref-b HEAD [--rounds 3] [--iters 2] \
        [--sf /root/testdata/sf0.1]

`--ref-b worktree` uses the LIVE repo dir (uncommitted changes
included) instead of a checkout.

Verdict rule: the side medians are compared; the difference is called
significant only when the median gap exceeds the larger side's own
min-max spread — otherwise the honest answer is "ambient noise", which
is exactly the adjudication the last three rounds needed receipts for.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, sys
sys.path.insert(0, os.getcwd())
from iceberg_evaluation_spark.plans.runner import run_benchmark
from iceberg_evaluation_spark.session import get_spark

name, sf, iters = sys.argv[1], sys.argv[2], int(sys.argv[3])
spark = get_spark(app_name="bench-ab", shuffle_partitions=32)
stats = run_benchmark(
    spark, sf, names=[name], iterations=iters, warmup=True,
    collect_rows=False,
)
s = stats[name]
print("ABRESULT " + json.dumps({
    "runs_s": s.runs_s, "bare_s": s.bare_s, "error": s.error,
}))
try:
    spark._jvm.org.apache.spark.sql.execution.streaming.state.StateStore.stop()
except Exception:
    pass
spark.stop()
"""


def _checkout(ref: str, tmp: str) -> str:
    if ref == "worktree":
        return REPO
    path = os.path.join(tmp, "wt_" + "".join(
        c if c.isalnum() else "_" for c in ref
    ))
    subprocess.run(
        ["git", "-C", REPO, "worktree", "add", "--detach", path, ref],
        check=True, capture_output=True,
    )
    return path


def _cleanup(ref: str, path: str) -> None:
    if ref == "worktree":
        return
    subprocess.run(
        ["git", "-C", REPO, "worktree", "remove", "--force", path],
        check=False, capture_output=True,
    )


def _run_side(cwd: str, query: str, sf: str, iters: int) -> dict:
    env = dict(os.environ)
    env.pop("SPARK_GRAFT_INVOCATION", None)
    out = subprocess.run(
        [sys.executable, "-c", CHILD, query, sf, str(iters)],
        cwd=cwd, env=env, capture_output=True, text=True, timeout=3600,
    )
    for line in out.stdout.splitlines():
        if line.startswith("ABRESULT "):
            return json.loads(line[len("ABRESULT "):])
    raise RuntimeError(
        f"no ABRESULT from {cwd}: rc={out.returncode}\n"
        f"stdout tail: {out.stdout[-2000:]}\nstderr tail: {out.stderr[-2000:]}"
    )


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--query", required=True)
    p.add_argument("--ref-a", required=True)
    p.add_argument("--ref-b", default="worktree")
    p.add_argument("--rounds", type=int, default=3,
                   help="interleaved fresh-session rounds per side")
    p.add_argument("--iters", type=int, default=2,
                   help="timed runs per session (after one warmup)")
    p.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    p.add_argument("--bare", action="store_true",
                   help="compare the operator-only (bare) timings")
    args = p.parse_args()

    load_before = os.getloadavg()

    def _steal_jiffies() -> int:
        # hypervisor CPU-steal counter: steal bursts (measured r11:
        # 12-20%/5s windows on this host) inflate barrier-style stages
        # several-fold; a per-side-run delta lets an anomalous sample be
        # discarded mechanically instead of argued about.
        try:
            with open("/proc/stat") as f:
                return int(f.readline().split()[8])
        except (OSError, IndexError, ValueError):
            return 0

    tmp = tempfile.mkdtemp(prefix="bench_ab_")
    sides = {}
    steal = {"a": [], "b": []}
    try:
        sides["a"] = _checkout(args.ref_a, tmp)
        sides["b"] = _checkout(args.ref_b, tmp)
        samples = {"a": [], "b": []}
        key = "bare_s" if args.bare else "runs_s"
        for rnd in range(args.rounds):
            for side in ("a", "b"):
                st0 = _steal_jiffies()
                res = _run_side(sides[side], args.query, args.sf, args.iters)
                steal[side].append(_steal_jiffies() - st0)
                if res.get("error"):
                    raise RuntimeError(
                        f"side {side} round {rnd}: {res['error']}"
                    )
                vals = res[key] or res["runs_s"]
                samples[side].extend(round(x, 3) for x in vals)
                print(
                    f"round {rnd} side {side}: {vals}", file=sys.stderr
                )
    finally:
        _cleanup(args.ref_a, sides.get("a", ""))
        _cleanup(args.ref_b, sides.get("b", ""))
    med_a = statistics.median(samples["a"])
    med_b = statistics.median(samples["b"])
    spread = max(
        max(samples["a"]) - min(samples["a"]),
        max(samples["b"]) - min(samples["b"]),
    )
    gap = med_b - med_a
    if abs(gap) <= spread:
        verdict = "ambient"
    else:
        verdict = "b_slower" if gap > 0 else "b_faster"
    print(json.dumps({
        "query": args.query,
        "ref_a": args.ref_a,
        "ref_b": args.ref_b,
        "metric": "bare_s" if args.bare else "runs_s",
        "samples_a": samples["a"],
        "samples_b": samples["b"],
        "median_a": round(med_a, 3),
        "median_b": round(med_b, 3),
        "gap_s": round(gap, 3),
        "max_side_spread_s": round(spread, 3),
        "verdict": verdict,
        "loadavg_before": [round(x, 2) for x in load_before],
        "loadavg_after": [round(x, 2) for x in os.getloadavg()],
        # per-(round, side) host-steal deltas, jiffies — a sample whose
        # session saw outsized steal is suspect regardless of medians
        "steal_jiffies_a": steal["a"],
        "steal_jiffies_b": steal["b"],
        "sf": args.sf,
    }))


if __name__ == "__main__":
    main()
