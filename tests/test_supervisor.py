"""Fast unit tests for the worker-recycle supervisor's building blocks
(vqa_tpu/serving/supervisor.py — the PJRT-leak mitigation, docs/LEAK_TPU.md).

The full topology (real server, forced recycle under load) is covered by
the slow-suite soak gates in test_soak.py; these tests pin the pieces
that make it work without paying a model warmup: RSS sampling, port
picking, the stdout readiness handshake, and SIGTERM escalation.
"""

from __future__ import annotations

import os
import socket
import sys

from vqa_tpu.serving.supervisor import (
    READY_MARKER,
    Worker,
    _pick_port,
    rss_mb,
)


def test_rss_mb_reads_self():
    assert rss_mb(os.getpid()) > 1.0


def test_rss_mb_gone_process_is_zero():
    # a PID beyond pid_max can't exist
    assert rss_mb(2**22 + 12345) == 0.0


def test_pick_port_is_bindable():
    port = _pick_port("127.0.0.1")
    assert 1024 <= port <= 65535
    s = socket.socket()
    s.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    s.bind(("127.0.0.1", port))
    s.close()


def test_worker_readiness_handshake():
    """ready is set exactly when the worker prints the marker line — the
    supervisor's only signal that the replacement is warm and bound."""
    w = Worker([
        sys.executable, "-u", "-c",
        f"import time; print('{READY_MARKER}http://x:1 (frontend)');"
        "time.sleep(60)",
    ])
    try:
        assert w.ready.wait(timeout=20)
        assert w.alive()
    finally:
        w.stop(drain_grace=5.0)
    assert not w.alive()


def test_worker_not_ready_without_marker():
    w = Worker([sys.executable, "-u", "-c",
                "import time; print('warming'); time.sleep(60)"])
    try:
        assert not w.ready.wait(timeout=2)
    finally:
        w.stop(drain_grace=5.0)


def test_initial_spawn_retries_on_wedged_warmup(tmp_path):
    """A first worker whose warmup never completes (observed in the wild:
    a lost axon-client RPC futex-parks the worker forever) must be killed
    at --ready-timeout and respawned, not turned into a supervisor exit.
    The fake worker is ready only on its SECOND spawn (flag-file state)."""
    import json
    import signal
    import subprocess
    import time

    flag = tmp_path / "second_spawn"
    fake = (
        "import os, sys, time; f = sys.argv[1]\n"
        "if os.path.exists(f):\n"
        f"    print({READY_MARKER + 'http://x:1'!r}, flush=True)\n"
        "else:\n"
        "    open(f, 'w').close(); print('warming', flush=True)\n"
        "time.sleep(120)\n"
    )
    cmd = f"{sys.executable} -u -c \"{fake}\" {flag}"
    proc = subprocess.Popen(
        [sys.executable, "-m", "vqa_tpu.serving.supervisor",
         "--port", "0", "--ready-timeout", "10", "--check-interval", "0.2",
         "--max-restarts", "3", "--worker-cmd", cmd],
        stdout=subprocess.PIPE, text=True)
    events = []
    deadline = time.monotonic() + 90
    assert proc.stdout is not None
    while time.monotonic() < deadline:
        line = proc.stdout.readline()
        if line.startswith("{"):
            ev = json.loads(line)
            events.append(ev["supervisor"])
            if ev["supervisor"] == "ready":
                break
    proc.send_signal(signal.SIGTERM)
    rc = proc.wait(timeout=30)
    kinds = [k for k in events if k != "spawn"]
    # under host load the first worker may be killed before it can even
    # start, costing an extra cycle — require >=1 retry then readiness
    assert kinds and kinds[-1] == "ready", events
    assert "ready_timeout" in kinds, events
    assert rc == 0


def test_stop_mid_recycle_reaps_both_children(tmp_path):
    """SIGTERM while a recycle overlap is in flight (old worker serving,
    replacement still warming) must interrupt the warmup wait promptly and
    reap BOTH children. Regression: the supervisor used to block in
    ready.wait() for the full --ready-timeout, get SIGKILLed by its
    parent's shorter kill-grace, and orphan the old worker (observed after
    the 140k on-chip soak: a live serving process left holding the TPU)."""
    import json
    import signal
    import subprocess
    import time

    flag = tmp_path / "first_spawn_done"
    # first spawn: ready instantly (and trips --recycle-rss-mb 1 at the
    # next RSS sample); later spawns: warm forever
    fake = (
        "import os, sys, time; f = sys.argv[1]\n"
        "if not os.path.exists(f):\n"
        "    open(f, 'w').close()\n"
        f"    print({READY_MARKER + 'http://x:1'!r}, flush=True)\n"
        "else:\n"
        "    print('warming forever', flush=True)\n"
        "time.sleep(300)\n"
    )
    cmd = f"{sys.executable} -u -c \"{fake}\" {flag}"
    proc = subprocess.Popen(
        [sys.executable, "-m", "vqa_tpu.serving.supervisor",
         "--port", "0", "--ready-timeout", "240", "--check-interval", "0.2",
         "--recycle-rss-mb", "1", "--worker-cmd", cmd],
        stdout=subprocess.PIPE, text=True)
    assert proc.stdout is not None
    child_pids = []
    deadline = time.monotonic() + 60
    saw_recycle_start = False
    while time.monotonic() < deadline:
        line = proc.stdout.readline()
        if not line.startswith("{"):
            continue
        ev = json.loads(line)
        if ev["supervisor"] == "spawn":
            child_pids.append(ev["pid"])
        if ev["supervisor"] == "recycle_start":
            saw_recycle_start = True
        if saw_recycle_start and len(child_pids) >= 2:
            break
    assert saw_recycle_start and len(child_pids) >= 2, child_pids
    # replacement is now stuck warming; stop must not take ~ready-timeout
    t0 = time.monotonic()
    proc.send_signal(signal.SIGTERM)
    proc.wait(timeout=45)
    assert time.monotonic() - t0 < 45
    # every child it ever spawned is gone
    time.sleep(1.0)
    for pid in child_pids:
        assert rss_mb(pid) == 0.0, f"orphaned child {pid}"


def test_recycle_period_warning_when_warmup_outpaces_serving():
    """When a replacement's warmup takes longer than the worker served
    before tripping the threshold, the sawtooth cannot stay under the
    bound (the 50k-soak failure mode, docs/LEAK_TPU.md) — the supervisor
    must say so via a recycle_period_warning event."""
    import json
    import signal
    import subprocess
    import time

    # every worker: 2 s warmup, then ready; threshold 1 MB trips at the
    # first RSS sample (~0.2 s serve period) → warmup (2 s) > serve period
    fake = (
        "import time; time.sleep(2.0)\n"
        f"print({READY_MARKER + 'http://x:1'!r}, flush=True)\n"
        "time.sleep(300)\n"
    )
    cmd = f"{sys.executable} -u -c \"{fake}\""
    proc = subprocess.Popen(
        [sys.executable, "-m", "vqa_tpu.serving.supervisor",
         "--port", "0", "--ready-timeout", "60", "--check-interval", "0.2",
         "--recycle-rss-mb", "1", "--worker-cmd", cmd],
        stdout=subprocess.PIPE, text=True)
    assert proc.stdout is not None
    kinds = []
    deadline = time.monotonic() + 60
    while time.monotonic() < deadline:
        line = proc.stdout.readline()
        if not line.startswith("{"):
            continue
        ev = json.loads(line)
        kinds.append(ev["supervisor"])
        if ev["supervisor"] == "recycle_period_warning":
            assert ev["warmup_s"] > ev["serve_s"], ev
            break
    proc.send_signal(signal.SIGTERM)
    proc.wait(timeout=45)
    assert "recycle_period_warning" in kinds, kinds


def test_persistently_wedged_recycle_disables_recycling(tmp_path):
    """Failed replacement warmups must spend the --max-restarts budget:
    a persistently wedged warmup (lost axon RPC) used to respawn a fresh
    candidate forever — one new PJRT client per attempt alongside the
    live worker — with no terminal event. Exhausting the budget must NOT
    take the port down (the old worker still serves); the supervisor
    turns recycling off and says so via a recycle_disabled event."""
    import json
    import signal
    import subprocess
    import time

    flag = tmp_path / "first_spawn_done"
    # first spawn: ready instantly (trips --recycle-rss-mb 1 at the next
    # RSS sample); every later spawn: warms forever
    fake = (
        "import os, sys, time; f = sys.argv[1]\n"
        "if not os.path.exists(f):\n"
        "    open(f, 'w').close()\n"
        f"    print({READY_MARKER + 'http://x:1'!r}, flush=True)\n"
        "else:\n"
        "    print('warming forever', flush=True)\n"
        "time.sleep(300)\n"
    )
    cmd = f"{sys.executable} -u -c \"{fake}\" {flag}"
    proc = subprocess.Popen(
        [sys.executable, "-m", "vqa_tpu.serving.supervisor",
         "--port", "0", "--ready-timeout", "3", "--check-interval", "0.2",
         "--recycle-rss-mb", "1", "--max-restarts", "1",
         "--worker-cmd", cmd],
        stdout=subprocess.PIPE, text=True)
    assert proc.stdout is not None
    events = []
    deadline = time.monotonic() + 60
    while time.monotonic() < deadline:
        line = proc.stdout.readline()
        if not line.startswith("{"):
            continue
        events.append(json.loads(line))
        if events[-1]["supervisor"] == "recycle_disabled":
            break
    kinds = [e["supervisor"] for e in events]
    assert "recycle_disabled" in kinds, kinds
    # budget: max-restarts 1 → exactly 2 failed attempts, then disabled
    assert kinds.count("recycle_ready_timeout") == 2, kinds
    # the live worker keeps serving: give the loop a few check intervals,
    # then a clean SIGTERM exit (rc 0, not giving_up)
    time.sleep(1.5)
    proc.send_signal(signal.SIGTERM)
    rc = proc.wait(timeout=45)
    rest = proc.stdout.read()
    for line in rest.splitlines():
        if line.startswith("{"):
            events.append(json.loads(line))
    kinds = [e["supervisor"] for e in events]
    assert rc == 0, kinds
    assert "giving_up" not in kinds, kinds
    # no recycle attempt after the disable event
    assert "recycle_start" not in kinds[kinds.index("recycle_disabled"):], kinds
    # nothing orphaned
    time.sleep(1.0)
    for e in events:
        if e["supervisor"] == "spawn":
            assert rss_mb(e["pid"]) == 0.0, f"orphaned child {e['pid']}"


def test_crash_looping_worker_fails_fast():
    """A worker that dies instantly (bad flags, import error) must burn a
    restart immediately, not --ready-timeout per try: with a 300 s
    ready-timeout and max-restarts 2 the supervisor must give up in
    seconds, not minutes."""
    import json
    import subprocess
    import time

    cmd = f"{sys.executable} -c \"import sys; sys.exit(3)\""
    t0 = time.monotonic()
    proc = subprocess.Popen(
        [sys.executable, "-m", "vqa_tpu.serving.supervisor",
         "--port", "0", "--ready-timeout", "300", "--check-interval", "0.2",
         "--max-restarts", "2", "--worker-cmd", cmd],
        stdout=subprocess.PIPE, text=True)
    rc = proc.wait(timeout=60)
    took = time.monotonic() - t0
    assert rc == 1
    assert took < 60, took
    assert proc.stdout is not None
    kinds = [json.loads(line)["supervisor"] for line in proc.stdout
             if line.startswith("{")]
    assert "giving_up" in kinds, kinds


def test_worker_stop_escalates_to_kill():
    """A worker that ignores SIGTERM must still die within the grace."""
    w = Worker([
        sys.executable, "-u", "-c",
        "import signal, time; signal.signal(signal.SIGTERM, "
        "signal.SIG_IGN); print('x'); time.sleep(120)",
    ])
    try:
        # give the child a beat to install its handler
        import time
        time.sleep(1.0)
        w.stop(drain_grace=2.0)
    finally:
        assert not w.alive()
