"""Leak-regression gate: a short CPU-backend soak must plateau.

Round 4's 10k on-chip soak caught a monotonic host-RSS growth
(docs/SOAK_TPU.json); the bisect exonerated the serving stack — the same
stack and request mix plateau on the CPU backend (the growth lives in
the TPU-client execution path, see scripts/repro_tpu_rss_leak.py). This
gate pins the serving stack's half of that result between on-chip
soaks: a 1k-request mixed-traffic soak on CPU must keep the RSS-plateau
criterion (<5% smoothed growth over the last third), zero contract
violations, and zero stuck micro-batch waiters. Reference analog: the
reference serves via uvicorn with no leak gate at all
(/root/reference/api/main.py:74-321).

Runs scripts/soak_test.py as a subprocess — the soak is a whole-process
measurement (RSS of server+clients), so in-process pytest execution
would contaminate it with the test session's own heap.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_supervised_soak_recycles(tmp_path):
    """The worker-recycle supervisor (the PJRT-leak mitigation,
    docs/LEAK_TPU.md) must keep serving through a forced recycle: the
    RSS bound is set BELOW the worker's baseline so a recycle starts
    mid-run, and every request must still succeed — the replacement
    worker overlaps the draining one via SO_REUSEPORT."""
    out = tmp_path / "soak_sup.json"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "soak_test.py"),
         "--tiny", "--platform", "cpu", "--requests", "600",
         "--clients", "8", "--supervisor-recycle-mb", "300",
         "--out", str(out)],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, (
        f"supervised soak failed rc={proc.returncode}\nstdout tail: "
        f"{proc.stdout[-2000:]}\nstderr tail: {proc.stderr[-2000:]}")
    report = json.loads(out.read_text())
    assert report["requests_total"] == report["expected_total"] == 600
    assert report["contract_violations"] == {}
    assert report["passed"]
    # a recycle began under load (completion may land after the last
    # request on a contended 1-core host; the 10k on-chip soak covers
    # the full recycle_done path)
    kinds = {e["supervisor"] for e in report["recycles"]}
    assert "recycle_start" in kinds, report["recycles"]


@pytest.mark.slow
def test_cpu_soak_rss_plateaus(tmp_path):
    out = tmp_path / "soak.json"
    env = dict(os.environ)
    # the soak process manages its own backend via --platform; drop the
    # conftest's virtual-device forcing so it sees a plain 1-device CPU
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "soak_test.py"),
         "--tiny", "--platform", "cpu", "--requests", "1000",
         "--clients", "8", "--out", str(out)],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, (
        f"soak failed rc={proc.returncode}\nstdout tail: "
        f"{proc.stdout[-2000:]}\nstderr tail: {proc.stderr[-2000:]}")
    report = json.loads(out.read_text())
    assert report["requests_total"] == report["expected_total"] == 1000
    assert report["contract_violations"] == {}
    assert report["stuck_waiters"] == 0
    assert report["rss_plateaued"], report["rss_growth_last_third_pct"]
    assert report["rss_growth_last_third_pct"] < 5.0
    assert report["passed"]
