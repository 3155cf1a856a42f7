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
