"""Test configuration: run the whole suite on a simulated 8-device CPU mesh.

The reference has no tests at all (SURVEY.md §4); this suite is the missing
pyramid. JAX's CPU backend doubles as the "fake device": the same jitted code
that runs on TPU runs here, and --xla_force_host_platform_device_count=8
provides a virtual 8-chip mesh for distributed tests without hardware.

Environment note: this image force-registers a remote TPU PJRT plugin
(axon) and overrides the JAX_PLATFORMS env var, so the only reliable way to
pin tests to CPU is jax.config.update after import. XLA_FLAGS still must be
set before the CPU client is instantiated.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.devices()[0].platform == "cpu"
assert len(jax.devices()) == 8


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled-program caches after each test module.

    A full-suite session accumulates hundreds of compiled CPU programs;
    past ~275 tests the XLA CPU compiler reproducibly aborts/segfaults
    compiling the next large while_loop program (observed at
    test_walk_table_exact_parity, 125 GB RAM free — internal compiler
    state, not system memory). Any two modules run together pass.
    Clearing per module bounds the accumulation; cross-module cache
    reuse is ~nil anyway (each module jits its own functions)."""
    yield
    jax.clear_caches()
