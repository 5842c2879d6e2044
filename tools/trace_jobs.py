#!/usr/bin/env python
"""Event-log job trace for one registered query (the r11 profiling
recipe, now a committed tool): run the query N times under an
event-logging session, then decompose the LAST run's wall into
job-execution time vs inter-job driver gaps, per job-group label.

At sf0.1 the lifecycle/classify corpus is driver-bound — per-action
scheduling/planning gaps rival executor time (guide §1/§7.3) — so the
numbers that matter are job COUNT and GAP time, not stage time.

    python tools/trace_jobs.py q138_lifecycle_dayloop [--runs 2]
        [--sf /root/testdata/sf0.1] [--aqe-detail]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("query")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument(
        "--aqe-detail",
        action="store_true",
        help="break out jobs whose callsite is the AQE stage materializer",
    )
    args = ap.parse_args()

    evdir = tempfile.mkdtemp(prefix="trace-ev-")
    from iceberg_evaluation_spark.plans import REGISTRY
    from iceberg_evaluation_spark.session import get_spark

    q = REGISTRY[args.query]
    spark = get_spark(
        app_name=f"trace-{args.query}",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": evdir,
            # Spark 4 compresses event logs by default; plain JSON keeps
            # this tool dependency-free (no zstd bindings in the sandbox)
            "spark.eventLog.compress": "false",
        },
    )
    sc = spark.sparkContext
    marks = []
    for i in range(args.runs):
        # job descriptions are thread-local: streaming/foreachBatch
        # threads submit under their own labels, so runs are attributed
        # by WALL-CLOCK WINDOW (epoch ms), not by description
        sc.setJobDescription(f"trace-run-{i}")
        w0 = time.time() * 1000
        t0 = time.monotonic()
        q.spark(spark, args.sf).write.format("noop").mode("overwrite").save()
        marks.append((i, time.monotonic() - t0, w0, time.time() * 1000))
        sc.setJobDescription(None)
    app_id = sc.applicationId
    spark.stop()

    path = os.path.join(evdir, app_id)
    if not os.path.exists(path):
        # Spark 4 event-log v2 layout: a directory of events_* files
        v2 = os.path.join(evdir, f"eventlog_v2_{app_id}")
        parts = sorted(
            os.path.join(v2, n)
            for n in os.listdir(v2)
            if n.startswith("events")
        )
    else:
        parts = [path]
    jobs = []  # (job_id, submit_ms, end_ms, desc, callsite)
    starts = {}

    def _lines():
        for p in parts:
            if p.endswith(".zstd"):
                import io

                import zstandard

                with open(p, "rb") as raw:
                    reader = zstandard.ZstdDecompressor().stream_reader(raw)
                    yield from io.TextIOWrapper(reader, encoding="utf-8")
            else:
                with open(p) as f:
                    yield from f

    for line in _lines():
        if True:
            try:
                ev = json.loads(line)
            except ValueError:
                continue
            et = ev.get("Event")
            if et == "SparkListenerJobStart":
                props = ev.get("Properties") or {}
                starts[ev["Job ID"]] = (
                    ev["Submission Time"],
                    props.get("spark.job.description", ""),
                    props.get("callSite.short", ""),
                )
            elif et == "SparkListenerJobEnd":
                jid = ev["Job ID"]
                if jid in starts:
                    sub, desc, cs = starts.pop(jid)
                    jobs.append((jid, sub, ev["Completion Time"], desc, cs))
    jobs.sort(key=lambda j: j[1])

    for i, wall, w0, w1 in marks:
        run = [j for j in jobs if w0 <= j[1] <= w1]
        if not run:
            print(f"run {i}: wall {wall:.2f}s, no jobs captured")
            continue
        exec_ms = sum(e - s for _, s, e, _, _ in run)
        gaps_ms = 0
        for (_, s1, e1, _, _), (_, s2, _, _, _) in zip(run, run[1:]):
            gaps_ms += max(0, s2 - e1)
        span = run[-1][2] - run[0][1]
        print(
            f"run {i}: wall {wall:.2f}s  jobs {len(run)}  "
            f"exec {exec_ms / 1e3:.2f}s  inter-job gaps {gaps_ms / 1e3:.2f}s  "
            f"span {span / 1e3:.2f}s"
        )
        if args.aqe_detail and i == marks[-1][0]:
            from collections import Counter

            by_cs = Counter()
            ms_by_cs = Counter()
            for _, s, e, _, cs in run:
                key = cs or "<none>"
                by_cs[key] += 1
                ms_by_cs[key] += e - s
            for cs, n in by_cs.most_common(12):
                print(f"    {n:4d} jobs {ms_by_cs[cs] / 1e3:7.2f}s  {cs}")
    print(f"event log: {parts[0] if parts else path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
