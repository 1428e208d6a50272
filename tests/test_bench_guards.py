"""bench.py's emission guards: the driver must ALWAYS get a parseable line.

Round 4's scored bench artifact was `rc: 124, parsed: null` — the script
printed nothing until fully done and was killed mid-run. Round 5 made the
result line progressive (re-emitted after every completed batch, last line
wins) with a SIGTERM/SIGINT/SIGALRM best-so-far flush (bench.py:31-89).
These tests pin the flush semantics in-process (bench.py imports no JAX at
module scope, so this costs nothing).
"""

from __future__ import annotations

import importlib.util
import json
import os
import signal

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

spec = importlib.util.spec_from_file_location(
    "bench", os.path.join(REPO, "bench.py"))
bench = importlib.util.module_from_spec(spec)
spec.loader.exec_module(bench)


@pytest.fixture(autouse=True)
def _reset_state(monkeypatch):
    monkeypatch.setattr(bench, "_LAST_LINE", None)
    monkeypatch.setattr(bench, "_FINAL_PRINTED", False)
    monkeypatch.setattr(bench, "_DEADLINE", None)
    # _flush_and_exit ends with os._exit(0); turn that into an exception
    # the test can catch instead of killing the pytest process
    monkeypatch.setattr(bench.os, "_exit",
                        lambda code: (_ for _ in ()).throw(SystemExit(code)))


def _last_json_line(cap):
    out = [ln for ln in cap.readouterr().out.strip().splitlines() if ln]
    assert out, "nothing printed"
    return json.loads(out[-1])


def test_emit_prints_parseable_line(capsys):
    bench.emit({"metric": "pairs_per_sec_per_chip", "value": 1.0,
                "unit": "pairs/s", "vs_baseline": 0.07})
    line = _last_json_line(capsys)
    assert line["value"] == 1.0
    assert bench._LAST_LINE["value"] == 1.0


# The flush tests capture at the FD level (capfd): the handler writes the
# raw fd via os.write, not sys.stdout — print()/flush() on the buffered
# writer can raise "reentrant call" if the signal lands mid-print.

def test_sigterm_flushes_best_so_far(capfd):
    bench.emit({"metric": "pairs_per_sec_per_chip", "value": 123.0,
                "unit": "pairs/s", "vs_baseline": 8.3})
    with pytest.raises(SystemExit) as e:
        bench._flush_and_exit(signal.SIGTERM, None)
    assert e.value.code == 0  # clean exit so the driver sees rc=0
    line = _last_json_line(capfd)
    assert line["value"] == 123.0
    assert line["partial"] is True
    assert line["killed_by"] == "SIGTERM"


def test_kill_before_any_batch_still_yields_a_line(capfd):
    with pytest.raises(SystemExit):
        bench._flush_and_exit(signal.SIGALRM, None)
    line = _last_json_line(capfd)
    assert line["metric"] == "pairs_per_sec_per_chip"
    assert line["value"] == 0.0
    assert "error" in line and line["killed_by"] == "SIGALRM"


def test_no_duplicate_line_after_final_emit(capfd):
    bench.emit({"metric": "pairs_per_sec_per_chip", "value": 9.0,
                "unit": "pairs/s", "vs_baseline": 0.6}, final=True)
    capfd.readouterr()
    with pytest.raises(SystemExit):
        bench._flush_and_exit(signal.SIGTERM, None)
    assert capfd.readouterr().out.strip() == ""  # final line already out


def test_flush_survives_reentrant_stdout(capfd, monkeypatch):
    """If the signal lands while the main thread holds the stdout
    BufferedWriter lock, any print()/flush() in the handler raises
    'reentrant call' and the best-so-far line would be lost — the
    handler must bypass sys.stdout entirely."""
    bench.emit({"metric": "pairs_per_sec_per_chip", "value": 7.0,
                "unit": "pairs/s", "vs_baseline": 0.5})
    capfd.readouterr()

    class _Reentrant:
        def write(self, s):
            raise RuntimeError("reentrant call inside <_io.BufferedWriter>")
        flush = write

    monkeypatch.setattr(bench.sys, "stdout", _Reentrant())
    with pytest.raises(SystemExit) as e:
        bench._flush_and_exit(signal.SIGTERM, None)
    assert e.value.code == 0
    line = _last_json_line(capfd)
    assert line["value"] == 7.0 and line["killed_by"] == "SIGTERM"


def test_time_left_tracks_deadline(monkeypatch):
    assert bench.time_left() == float("inf")
    monkeypatch.setattr(bench, "_DEADLINE", bench.time.monotonic() + 10.0)
    assert 8.0 < bench.time_left() <= 10.0
