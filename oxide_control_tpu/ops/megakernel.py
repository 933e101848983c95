"""Whole-step Pallas TPU kernel: K environment steps per kernel invocation.

Wraps the scalar-graph step (ops/scalar_graph.py) in a single Pallas kernel:
the grid partitions the env batch into (TILE,) lanes-aligned tiles, each
program carries its tile's state in vector registers/VMEM through an inner
K-step ``fori_loop``, and writes back only the final state plus per-step
rewards.  One kernel launch per K steps means zero per-op dispatch overhead
and no HBM round-trips between pipeline stages — the design the BASELINE
"speed-of-light per chip" target requires.

In-kernel env layer (optional): cheetah-run style reward on the forward
speed, time-limit + divergence termination, and masked auto-reset to qpos0
with PRNG noise — the lockstep analog of BatchedEnvironment.step.
"""

from __future__ import annotations

import functools
import math

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..model import Model
from . import scalar_graph as sg


def supports(model: Model) -> bool:
    return sg.supports(model)


def build_rollout(
    model: Model,
    batch: int,
    steps_per_call: int,
    tile: int = 1024,
    reward: str | None = "speed",
    run_speed: float = 10.0,
    time_limit: float = 10.0,
    reset_noise: float = 0.1,
    interpret: bool = False,
):
    """Compile a K-step rollout kernel.

    Returns ``fn(qpos (nq,B), qvel (nv,B), ws (nv,B), time (1,B),
    ctrl (K,nu,B), seed (1,1) int32) -> (qpos', qvel', ws', time',
    reward_sum (1,B))``.

    Layout note: state arrays are **coordinate-major** (nq, B) so each
    coordinate row is a full lane vector per tile.
    """
    assert supports(model)
    assert batch % tile == 0
    nq, nv, nu = model.nq, model.nv, model.nu
    step = sg.build_step(model)
    h = float(model.opt.timestep)
    k_steps = steps_per_call
    qpos0 = [float(x) for x in np.asarray(jax.device_get(model.qpos0))]
    limit_steps = time_limit - 1e-6

    def kernel(qpos_ref, qvel_ref, ws_ref, time_ref, ctrl_ref, seed_ref,
               oq_ref, ov_ref, ows_ref, ot_ref, orew_ref):
        if reset_noise:
            # per-tile PRNG stream for reset randomization
            pltpu.prng_seed(seed_ref[0] + pl.program_id(0))

        q0 = tuple(qpos_ref[i, :] for i in range(nq))
        v0 = tuple(qvel_ref[i, :] for i in range(nv))
        w0 = tuple(ws_ref[i, :] for i in range(nv))
        t0 = time_ref[0, :]
        rew0 = jnp.zeros_like(t0)

        def body(k, carry):
            q, v, w, t, rew = carry
            c = tuple(ctrl_ref[k, u, :] for u in range(nu))
            q, v, w = step(list(q), list(v), list(w), list(c))
            t = t + h

            if reward == "speed":
                # tolerance(speed, (run_speed, inf), margin=run_speed,
                # value_at_margin=0, sigmoid=linear)
                speed = v[0]
                r = jnp.clip(speed / run_speed, 0.0, 1.0)
                rew = rew + r

            # divergence + time-limit -> masked auto-reset
            bad = jnp.zeros_like(t, dtype=jnp.bool_)
            for val in list(q) + list(v):
                if not sg._is_const(val):
                    bad = bad | ~jnp.isfinite(val) | (jnp.abs(val) > 1e10)
            done = bad | (t > limit_steps)

            if reset_noise:
                bits = pltpu.prng_random_bits((nq,) + t.shape)
                signed = pltpu.bitcast(bits, jnp.int32).astype(t.dtype)
                q_reset = [
                    qpos0[i] + reset_noise * (signed[i] * (2.0 ** -31))
                    for i in range(nq)
                ]
            else:
                q_reset = qpos0
            q = tuple(jnp.where(done, q_reset[i], q[i]) for i in range(nq))
            v = tuple(jnp.where(done, 0.0, v[i]) for i in range(nv))
            w = tuple(jnp.where(done, 0.0, w[i]) for i in range(nv))
            t = jnp.where(done, 0.0, t)
            return (q, v, w, t, rew)

        q, v, w, t, rew = jax.lax.fori_loop(
            0, k_steps, body, (q0, v0, w0, t0, rew0)
        )
        for i in range(nq):
            oq_ref[i, :] = q[i]
        for i in range(nv):
            ov_ref[i, :] = v[i]
            ows_ref[i, :] = w[i]
        ot_ref[0, :] = t
        orew_ref[0, :] = rew

    grid = (batch // tile,)

    def spec(rows):
        return pl.BlockSpec((rows, tile), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    ctrl_spec = pl.BlockSpec(
        (k_steps, nu, tile), lambda i: (0, 0, i), memory_space=pltpu.VMEM
    )
    seed_spec = pl.BlockSpec(memory_space=pltpu.SMEM)

    def fn(qpos, qvel, ws, time, ctrl, seed):
        dtype = qpos.dtype
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[spec(nq), spec(nv), spec(nv), spec(1), ctrl_spec,
                      seed_spec],
            out_specs=(spec(nq), spec(nv), spec(nv), spec(1), spec(1)),
            out_shape=(
                jax.ShapeDtypeStruct((nq, batch), dtype),
                jax.ShapeDtypeStruct((nv, batch), dtype),
                jax.ShapeDtypeStruct((nv, batch), dtype),
                jax.ShapeDtypeStruct((1, batch), dtype),
                jax.ShapeDtypeStruct((1, batch), dtype),
            ),
            interpret=interpret,
        )(qpos, qvel, ws, time, ctrl, seed)

    return jax.jit(fn, donate_argnums=(0, 1, 2, 3))
