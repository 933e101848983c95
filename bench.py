#!/usr/bin/env python
"""Benchmark: env-steps/s/chip, 4096 batched cheetah-run envs (BASELINE.md).

Runs the full environment step (physics + observation + reward + termination
+ masked auto-reset) in lockstep on one chip, many steps per device call via
lax.scan with a donated carry.  Prints ONE JSON line:
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from oxide_control_tpu import suite

BATCH = 4096
STEPS_PER_CALL = 100
WARMUP_CALLS = 2
TIMED_CALLS = 5
TARGET = 5.0e6  # BASELINE.json north star: >=5M env-steps/s/chip


def main():
    benv = suite.load_batched("cheetah", "run", BATCH, dtype=np.float32)
    nu = benv.model.nu

    def bundle(data, rng):
        def body(carry, key):
            d, k_unused = carry
            k_act, k_reset = jax.random.split(key)
            action = jax.random.uniform(
                k_act, (BATCH, nu), minval=-1.0, maxval=1.0, dtype=jnp.float32
            )
            d, ts = benv.step(d, action, k_reset)
            return (d, key), ts.reward[0]

        keys = jax.random.split(rng, STEPS_PER_CALL)
        (data, _), rewards = jax.lax.scan(body, (data, rng), keys)
        return data, rewards[-1]

    bundle_j = jax.jit(bundle, donate_argnums=(0,))

    rng = jax.random.PRNGKey(0)
    t_compile = time.perf_counter()
    data, _ = jax.jit(benv.reset)(rng)
    for i in range(WARMUP_CALLS):
        rng, sub = jax.random.split(rng)
        data, r = bundle_j(data, sub)
    jax.block_until_ready(r)
    compile_s = time.perf_counter() - t_compile

    t0 = time.perf_counter()
    for i in range(TIMED_CALLS):
        rng, sub = jax.random.split(rng)
        data, r = bundle_j(data, sub)
    jax.block_until_ready(r)
    dt = time.perf_counter() - t0

    steps = BATCH * STEPS_PER_CALL * TIMED_CALLS
    value = steps / dt
    print(
        json.dumps(
            {
                "metric": "cheetah-run env-steps/s/chip @ batch 4096",
                "value": round(value, 1),
                "unit": "env-steps/s",
                "vs_baseline": round(value / TARGET, 4),
                "detail": {
                    "batch": BATCH,
                    "steps_per_call": STEPS_PER_CALL,
                    "timed_calls": TIMED_CALLS,
                    "wall_s": round(dt, 3),
                    "warmup_and_compile_s": round(compile_s, 1),
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
