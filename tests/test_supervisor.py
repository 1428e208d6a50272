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
