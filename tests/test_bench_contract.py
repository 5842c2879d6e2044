"""The driver contract for bench.py: the FINAL stdout line is one SHORT
JSON object (<200 bytes — the driver's tail window truncates long lines)
with metric/value/unit/sf and ok/failed counts; the full per-query map
goes to BENCH_DETAIL.json. Runs as a subprocess at sf0.001 exactly as
the driver would."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_final_line_is_short_and_detail_file_is_complete():
    # ITERS=1: this test checks the OUTPUT CONTRACT (one short JSON
    # line, complete per-query detail file), not timing methodology —
    # every assertion is iteration-count-independent. At 141 queries the
    # default median-of-3 run (3 timed + 3 bare-variant passes per
    # query) sits right at the 1800 s subprocess timeout on a quiet
    # 32-core box and over it under any contention; one pass keeps the
    # contract check well inside the budget at every corpus size.
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_ITERS="1",
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True,
        text=True,
        env=env,
        timeout=1800,
        cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [l for l in proc.stdout.splitlines() if l.strip()]
    assert len(lines) == 1, f"expected ONE stdout line, got {len(lines)}"
    assert len(lines[0]) < 200, f"final line too long ({len(lines[0])} bytes)"
    d = json.loads(lines[0])
    assert d["metric"] == "corpus_total_wall"
    assert d["unit"] == "sec"
    assert isinstance(d["value"], (int, float)) and d["value"] > 0
    assert d["sf"] == "0.001"
    assert d["n_failed"] == 0

    from iceberg_evaluation_spark.plans import REGISTRY

    # r8: a run whose label differs from the committed canonical
    # artifact's diverts to a label-suffixed sidecar (clobber guard) —
    # read whichever file THIS run wrote (the note names it on stderr)
    import re

    detail_file = os.path.join(REPO, "BENCH_DETAIL.json")
    m = re.search(r" run to (\S*BENCH_DETAIL\.\S+\.json) \(", proc.stderr)
    if m:
        detail_file = m.group(1)
    with open(detail_file) as f:
        detail = json.load(f)
    assert set(detail["queries"]) == set(REGISTRY)
    assert all(isinstance(v, (int, float)) for v in detail["queries"].values())
    assert d["n_ok"] == len(detail["queries"])
    assert "failed" not in detail, detail.get("failed")
