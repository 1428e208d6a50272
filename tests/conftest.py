"""Test configuration: force an 8-virtual-device CPU platform so multi-chip
sharding is testable without TPU hardware (SURVEY.md §4 test plan).

NOTE: this host exposes the real TPU through the 'axon' PJRT plugin, which
ignores the JAX_PLATFORMS env var — the config API must be used instead.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# Parity mode: DEFAULT matmul/conv precision uses reduced-precision passes;
# numerics tests need full f32 (SURVEY.md §7 dual dtype policy).
jax.config.update("jax_default_matmul_precision", "highest")

from vqa_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: full-size model tests (minutes on a 1-core host)"
    )


def pytest_collection_modifyitems(config, items):
    if config.getoption("-m", default=""):
        return
    # a node ID named explicitly on the command line always runs
    explicit = [a for a in config.args if "::" in a]
    skip_slow = pytest.mark.skip(reason="slow: run with -m slow")
    for item in items:
        if "slow" in item.keywords and not any(
            item.nodeid == a or item.nodeid.endswith(a) or a.endswith(item.nodeid)
            for a in explicit
        ):
            item.add_marker(skip_slow)
