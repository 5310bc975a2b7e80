"""Test configuration: force CPU with 8 virtual devices, enable float64.

Multi-chip sharding logic is validated on a virtual CPU mesh
(``--xla_force_host_platform_device_count=8``), per SURVEY.md section 4's
test strategy; numerical parity tests run in float64 on CPU.

Note: in this environment jax may already be imported at interpreter startup
(site customization), so the platform is switched via ``jax.config.update``
rather than environment variables alone.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
