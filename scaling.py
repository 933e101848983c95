#!/usr/bin/env python
"""Scaling-efficiency harness (BASELINE.md scaling requirement).

Measures env-steps/s at 1 device and at N devices with the env batch
sharded over a 1-D mesh (weak scaling: fixed per-device batch), and writes
``SCALING.json``.  On a development box it runs against a virtual N-device
CPU mesh (``--xla_force_host_platform_device_count``); on a real slice the
same script measures ICI/DCN scaling — the sharded step is the same
``NamedSharding(P('env'))`` program either way (parallel/mesh.py).

Usage:
    python scaling.py                 # virtual 8-device CPU mesh
    SCALING_DEVICES=4 python scaling.py
    SCALING_PLATFORM=tpu python scaling.py   # real devices (no forcing)
"""

import json
import os
import time

N_DEV = int(os.environ.get("SCALING_DEVICES", "8"))
PLATFORM = os.environ.get("SCALING_PLATFORM", "cpu")
if PLATFORM == "cpu":
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={N_DEV}"
        ).strip()

import numpy as np
import jax

if PLATFORM == "cpu":
    # the ambient environment pins JAX_PLATFORMS to the TPU tunnel; the env
    # var alone is not always honored, force the config too (see
    # tests/conftest.py note)
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from oxide_control_tpu import suite
from oxide_control_tpu.parallel import mesh as mesh_mod

DOMAIN = os.environ.get("SCALING_DOMAIN", "cheetah")
TASK = os.environ.get("SCALING_TASK", "run")
PER_DEVICE_BATCH = int(os.environ.get("SCALING_PER_DEVICE_BATCH", "256"))
STEPS_PER_CALL = int(os.environ.get("SCALING_STEPS", "20"))
TIMED_CALLS = 5


def measure(n_devices: int, batch: int) -> float:
    """env-steps/s for the general sharded path on the first n devices."""
    benv = suite.load_batched(DOMAIN, TASK, batch, dtype=np.float32)
    m = mesh_mod.make_env_mesh(n_devices)
    nu = benv.model.nu

    def bundle(data, rng):
        def body(carry, key):
            d, _ = carry
            k_act, k_reset = jax.random.split(key)
            action = jax.random.uniform(
                k_act, (batch, nu), minval=-1.0, maxval=1.0, dtype=jnp.float32
            )
            d, ts = benv.step(d, action, k_reset)
            return (d, key), ts.reward[0]

        keys = jax.random.split(rng, STEPS_PER_CALL)
        (data, _), rewards = jax.lax.scan(body, (data, rng), keys)
        return data, rewards[-1]

    bundle_j = jax.jit(bundle, donate_argnums=(0,))
    rng = jax.random.PRNGKey(0)
    data, _ = jax.jit(benv.reset)(rng)
    data = mesh_mod.shard_env_state(m, data)

    # warmup/compile
    rng, sub = jax.random.split(rng)
    data, r = bundle_j(data, sub)
    np.asarray(r)  # host transfer = true device sync

    t0 = time.perf_counter()
    for _ in range(TIMED_CALLS):
        rng, sub = jax.random.split(rng)
        data, r = bundle_j(data, sub)
    np.asarray(r)
    wall = time.perf_counter() - t0
    return batch * STEPS_PER_CALL * TIMED_CALLS / wall


def main():
    avail = len(jax.devices())
    n_hi = min(N_DEV, avail)
    # fixed TOTAL batch on both runs: on real chips this measures strong
    # scaling (ideal rate_n = n * rate_1); on a virtual CPU mesh the
    # "devices" share one compute pool, so ideal rate_n = rate_1 and the
    # ratio isolates the pure sharding/collective overhead.
    batch = PER_DEVICE_BATCH * n_hi
    rate1 = measure(1, batch)
    rate_n = measure(n_hi, batch)
    virtual = (jax.devices()[0].platform == "cpu")
    eff = (rate_n / rate1 if virtual else rate_n / (n_hi * rate1)) if rate1 else 0.0
    out = {
        "task": f"{DOMAIN}-{TASK}",
        "platform": jax.devices()[0].platform,
        "total_batch": batch,
        "rates": {"1": round(rate1, 1), str(n_hi): round(rate_n, 1)},
        ("sharding_efficiency_virtual" if virtual
         else "strong_scaling_efficiency"): round(eff, 4),
        "devices_available": avail,
    }
    with open(os.path.join(os.path.dirname(__file__) or ".", "SCALING.json"),
              "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
