"""Execution-mode parity: the flagship battery must produce IDENTICAL
digests on a real multi-process cluster (local-cluster[2,2,2048] — two
executor JVMs, remote Python workers) and in the single-JVM local mode
every other test uses. Catches single-process assumptions: broadcast
across process boundaries, localCheckpoint block visibility, Arrow
transfer to remote pythons, Python-worker env propagation.

The cluster session runs in a subprocess (one SparkContext per JVM).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

from spectraplex_spark.testing.cluster_smoke import collect_digests

SF_DIR = "/root/testdata/sf0.001"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_flagships_on_local_cluster_match_local_mode(spark):
    want = collect_digests(spark, SF_DIR)
    env = dict(os.environ, PYTHONPATH=REPO)
    proc = subprocess.run(
        [sys.executable, "-m", "spectraplex_spark.testing.cluster_smoke", SF_DIR],
        capture_output=True,
        text=True,
        timeout=540,
        env=env,
        cwd=REPO,
    )
    assert proc.returncode == 0, f"cluster smoke failed:\n{proc.stderr[-4000:]}"
    line = next(
        (l for l in proc.stdout.splitlines() if l.startswith("SMOKE_RESULT ")), None
    )
    assert line, f"no SMOKE_RESULT in output:\n{proc.stdout[-2000:]}"
    got = json.loads(line[len("SMOKE_RESULT "):])
    assert got == want
