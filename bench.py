#!/usr/bin/env python
"""Benchmark: env-steps/s/chip, 4096 batched cheetah-run envs (BASELINE.md).

Runs the full environment step (physics + reward + termination + masked
auto-reset + random policy) in lockstep on one chip.  When the (model, task)
pair qualifies, the whole K-step rollout runs as ONE Pallas kernel
(parallel.rollout.FastRollout); otherwise the general vmapped pipeline.

Prints ONE JSON line:
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Timing note: device sync is forced by a host transfer of the per-env reward
sums (np.asarray), not block_until_ready — under the tunneled TPU platform
block_until_ready can return before remote execution finishes, which
silently turns the timing loop into an enqueue benchmark.
"""

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/oxide_jax_cache")

import numpy as np

import jax
import jax.numpy as jnp

from oxide_control_tpu import suite
from oxide_control_tpu.parallel import rollout as rollout_mod

BATCH = 4096
STEPS_PER_CALL = 200
WARMUP_CALLS = 1
TIMED_CALLS = 10
TARGET = 5.0e6  # BASELINE.json north star: >=5M env-steps/s/chip


def bench_fast(benv):
    roll = rollout_mod.FastRollout(benv, STEPS_PER_CALL)
    state = roll.init(jax.random.PRNGKey(0))
    rng = jax.random.PRNGKey(1)

    t_compile = time.perf_counter()
    for _ in range(WARMUP_CALLS):
        rng, sub = jax.random.split(rng)
        state, rew = roll.run(state, sub)
    np.asarray(rew)  # host transfer = true device sync
    compile_s = time.perf_counter() - t_compile

    t0 = time.perf_counter()
    for _ in range(TIMED_CALLS):
        rng, sub = jax.random.split(rng)
        state, rew = roll.run(state, sub)
    rew_host = np.asarray(rew)
    wall = time.perf_counter() - t0
    assert np.all(np.isfinite(rew_host))
    return wall, compile_s, "pallas-megakernel"


def bench_general(benv):
    nu = benv.model.nu

    def bundle(data, rng):
        def body(carry, key):
            d, _ = carry
            k_act, k_reset = jax.random.split(key)
            action = jax.random.uniform(
                k_act, (BATCH, nu), minval=-1.0, maxval=1.0,
                dtype=jnp.float32,
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
    for _ in range(WARMUP_CALLS):
        rng, sub = jax.random.split(rng)
        data, r = bundle_j(data, sub)
    np.asarray(r)
    compile_s = time.perf_counter() - t_compile

    t0 = time.perf_counter()
    for _ in range(TIMED_CALLS):
        rng, sub = jax.random.split(rng)
        data, r = bundle_j(data, sub)
    np.asarray(r)
    wall = time.perf_counter() - t0
    return wall, compile_s, "general-vmap"


def main():
    benv = suite.load_batched("cheetah", "run", BATCH, dtype=np.float32)
    if rollout_mod.fast_rollout_supported(benv):
        wall, compile_s, path = bench_fast(benv)
    else:
        wall, compile_s, path = bench_general(benv)

    steps = BATCH * STEPS_PER_CALL * TIMED_CALLS
    rate = steps / wall
    dev = jax.devices()[0]
    print(json.dumps({
        "metric": "cheetah-run env-steps/s/chip @ batch 4096",
        "value": round(rate, 1),
        "unit": "env-steps/s",
        "vs_baseline": round(rate / TARGET, 4),
        "detail": {
            "path": path,
            "batch": BATCH,
            "steps_per_call": STEPS_PER_CALL,
            "timed_calls": TIMED_CALLS,
            "wall_s": round(wall, 3),
            "warmup_and_compile_s": round(compile_s, 1),
            "device": str(getattr(dev, "device_kind", dev)),
        },
    }))


if __name__ == "__main__":
    main()
