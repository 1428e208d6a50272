"""Multi-host (multi-process) runtime initialization + helpers.

The reference is strictly single-process / single-device — its "backend
selection" is picking one of {cuda, cpu} (reference: utils/config.py:249-259)
and no collective is ever issued (SURVEY.md §2.6). On a TPU pod, each host
runs one process that only sees its local chips; ``jax.distributed.initialize``
joins those processes into one global runtime so ``jax.devices()`` spans the
whole pod, GSPMD collectives ride ICI, and every host feeds its local shard
of the global batch (``jax.make_array_from_process_local_data`` — used by
``data.pipeline.prefetch_to_device``).

Single-process (v5e-1, CPU tests) is the degenerate case: ``initialize`` is
a no-op and every helper collapses to the trivial answer, so callers never
branch on topology.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax

_initialized = False


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[Sequence[int]] = None,
) -> bool:
    """Initialize the multi-process JAX runtime. Returns True iff the runtime
    ends up multi-process.

    Three ways in, checked in order:
      1. explicit args (tests / bespoke launchers),
      2. standard env vars (``JAX_COORDINATOR_ADDRESS``/``JAX_NUM_PROCESSES``/
         ``JAX_PROCESS_ID`` — set by most launchers),
      3. Cloud TPU pod metadata (``jax.distributed.initialize()`` with no
         args auto-detects on TPU pods / GKE).

    Idempotent and safe to call on a single host: with no args, no env vars,
    and no pod metadata it does nothing. MUST run before the first backend
    touch (any jax.devices()/jit call) or the process-local view is frozen.
    """
    # NOTE: must not touch the backend (jax.process_count()/jax.devices())
    # before deciding — the first backend touch freezes the process-local
    # device view. The no-op decision below reads env vars only.
    global _initialized
    if _initialized:
        return jax.process_count() > 1

    env_coord = os.environ.get("JAX_COORDINATOR_ADDRESS")
    env_nproc = os.environ.get("JAX_NUM_PROCESSES")
    env_pid = os.environ.get("JAX_PROCESS_ID")
    # a real pod lists MULTIPLE worker hostnames; single-host TPU plugins
    # (e.g. the axon tunnel) set TPU_WORKER_HOSTNAMES=localhost — not a pod
    tpu_hosts = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    on_tpu_pod = (
        len([h for h in tpu_hosts.split(",") if h]) > 1
        or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS") is not None
    )

    if coordinator_address is None and env_coord:
        coordinator_address = env_coord
        num_processes = num_processes or (int(env_nproc) if env_nproc else None)
        process_id = process_id if process_id is not None else (
            int(env_pid) if env_pid is not None else None
        )

    if coordinator_address is None and not on_tpu_pod:
        return False  # plain single-process run

    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            local_device_ids=local_device_ids,
        )
    except RuntimeError as e:  # e.g. a test harness already initialized it
        if "already" not in str(e).lower():
            raise
    _initialized = True
    return jax.process_count() > 1


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def is_primary() -> bool:
    """True on exactly one process — gate checkpoint/artifact writes and
    chatty logging with this on pods (every host runs the same script)."""
    return jax.process_index() == 0


def local_batch_size(global_batch_size: int) -> int:
    """Per-process slice of the global batch each host's loader must yield."""
    n = jax.process_count()
    if global_batch_size % n != 0:
        raise ValueError(
            f"global batch {global_batch_size} not divisible by "
            f"{n} processes"
        )
    return global_batch_size // n
