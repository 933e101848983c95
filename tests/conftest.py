"""Test configuration.

Tests run on a virtual 8-device CPU mesh with x64 enabled so golden
comparisons against CPU MuJoCo (f64) are tight; see SURVEY.md §4 item 4.
Must run before jax is imported anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
