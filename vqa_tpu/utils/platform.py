"""Shared --platform/--virtual-devices CLI plumbing.

All three entry points (train, evaluate, serve) need the same two flags
and the same config-API application (the axon PJRT plugin ignores the
JAX_PLATFORMS env var, so ``jax.config.update`` is the only reliable
mechanism). One definition keeps the flags, help text, and ordering
rules in lockstep.
"""

from __future__ import annotations

import os


def add_platform_args(parser) -> None:
    parser.add_argument(
        "--platform",
        default=os.environ.get("JAX_PLATFORMS") or None,
        help="force a jax platform (e.g. cpu) via the config API — "
             "out-of-tree PJRT plugins (axon) ignore the JAX_PLATFORMS "
             "env var",
    )
    parser.add_argument(
        "--virtual-devices",
        type=int,
        default=None,
        help="with --platform cpu: number of virtual CPU devices "
             "(test multi-chip sharding without hardware)",
    )


def apply_platform_args(args) -> None:
    """MUST run before the first JAX backend touch."""
    import jax

    if getattr(args, "platform", None):
        jax.config.update("jax_platforms", args.platform)
    if getattr(args, "virtual_devices", None):
        jax.config.update("jax_num_cpu_devices", args.virtual_devices)
