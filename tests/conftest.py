"""Test configuration.

Tests run on a virtual 8-device CPU mesh with x64 enabled so golden
comparisons against CPU MuJoCo (f64) are tight; see SURVEY.md §4 item 4.

NOTE: the ambient environment pins JAX_PLATFORMS to the experimental TPU
tunnel platform; tests must force-override to cpu (plain setdefault is not
enough) or every eager op round-trips through the tunnel.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
