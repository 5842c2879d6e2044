"""The driver contract for bench.py: one JSON line on stdout with
metric/value/unit/queries/sf, no failures, every registered query
present. Runs as a subprocess at sf0.001 exactly as the driver would."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_prints_one_json_line_with_contract_keys():
    env = dict(os.environ, SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True,
        text=True,
        env=env,
        timeout=1200,
        cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [l for l in proc.stdout.splitlines() if l.strip()]
    assert len(lines) == 1, f"expected ONE stdout line, got {len(lines)}"
    d = json.loads(lines[0])
    assert d["metric"] == "corpus_total_wall"
    assert d["unit"] == "sec"
    assert isinstance(d["value"], (int, float)) and d["value"] > 0
    assert d["sf"] == "0.001"
    assert "failed" not in d, d.get("failed")

    from iceberg_evaluation_spark.plans import REGISTRY

    assert set(d["queries"]) == set(REGISTRY)
    assert all(isinstance(v, (int, float)) for v in d["queries"].values())
