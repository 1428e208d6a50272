"""Probe: can TWO processes hold live axon/TPU PJRT clients at once?

The serving supervisor's zero-downtime recycle (vqa_tpu/serving/supervisor.py)
overlaps the old worker (actively executing on the TPU) with a replacement
worker that must initialize its own PJRT client, compile/deserialize its
buckets, and warm up — all while the old client is busy. This probe measures
that exact overlap in miniature:

  role=holder  — initializes the TPU client, then runs a jitted forward in a
                 loop for --hold-s seconds (steady execution load).
  role=joiner  — started mid-hold; times TPU client init, first compile, and
                 10 executions, then exits.

Run (orchestrates both):  python scripts/probe_dual_client.py
Prints one JSON line: {"dual_client_ok": bool, joiner timings, holder stats}.

No reference analog (the reference serves from a single uvicorn process,
/root/reference/api/main.py:293-321); this validates a deployment mode the
reference does not have.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def _worker(role: str, hold_s: float) -> None:
    t0 = time.monotonic()
    import jax
    import jax.numpy as jnp

    devs = jax.devices()
    t_init = time.monotonic() - t0

    @jax.jit
    def f(x):
        return (x @ x).sum()

    x = jnp.ones((512, 512), jnp.bfloat16)
    f(x).block_until_ready()
    t_first = time.monotonic() - t0

    if role == "holder":
        print(json.dumps({"role": role, "init_s": round(t_init, 2),
                          "first_exec_s": round(t_first, 2),
                          "backend": jax.default_backend()}), flush=True)
        n = 0
        while time.monotonic() - t0 < hold_s:
            f(x).block_until_ready()
            n += 1
        print(json.dumps({"role": role, "execs": n, "done": True}), flush=True)
    else:
        ts = time.monotonic()
        for _ in range(10):
            f(x).block_until_ready()
        t_ten = time.monotonic() - ts
        print(json.dumps({"role": role, "init_s": round(t_init, 2),
                          "first_exec_s": round(t_first, 2),
                          "ten_execs_s": round(t_ten, 3),
                          "backend": jax.default_backend(),
                          "n_devices": len(devs)}), flush=True)


def main() -> int:
    if len(sys.argv) > 1:
        _worker(sys.argv[1], float(sys.argv[2]))
        return 0

    env = dict(os.environ)
    hold_s = 90.0
    holder = subprocess.Popen(
        [sys.executable, __file__, "holder", str(hold_s)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
    # wait for the holder to report it is initialized and executing
    holder_first = None
    assert holder.stdout is not None
    for line in holder.stdout:
        line = line.strip()
        if line.startswith("{"):
            holder_first = json.loads(line)
            break
    if holder_first is None:
        print(json.dumps({"dual_client_ok": False,
                          "error": "holder never initialized"}))
        return 1

    t_join0 = time.monotonic()
    joiner = subprocess.run(
        [sys.executable, __file__, "joiner", "0"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        timeout=300, env=env)
    join_wall = time.monotonic() - t_join0
    joiner_stats = None
    for line in joiner.stdout.splitlines():
        line = line.strip()
        if line.startswith("{") and '"joiner"' in line:
            joiner_stats = json.loads(line)

    holder.wait(timeout=hold_s + 60)
    holder_rest = holder.stdout.read()
    holder_done = '"done": true' in holder_rest

    ok = (joiner.returncode == 0 and joiner_stats is not None
          and joiner_stats.get("backend") == "tpu" and holder_done)
    print(json.dumps({
        "dual_client_ok": bool(ok),
        "holder": holder_first,
        "holder_survived": holder_done,
        "joiner": joiner_stats,
        "joiner_wall_s": round(join_wall, 2),
        "joiner_rc": joiner.returncode,
        "joiner_tail": ("" if joiner_stats else joiner.stdout[-800:]),
    }))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
