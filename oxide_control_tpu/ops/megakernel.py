"""Whole-step Pallas TPU kernel: K environment steps per kernel invocation.

Wraps the scalar-graph step (ops/scalar_graph.py) in a single Pallas kernel:
the grid partitions the env batch into (TILE,) lanes-aligned tiles, each
program carries its tile's state in vector registers/VMEM through an inner
K-step ``fori_loop``, and writes back the final state plus per-env reward
sums and divergence counts — and, since r4, the full per-step trajectory an
RL consumer needs: observations, rewards, done flags, and applied actions.

In-kernel env layer (via :class:`EnvHooks`): task reward computed on the
post-step state, task observation computed on the pre-step state (the
policy input), time-limit + divergence termination, and masked auto-reset
to qpos0 + per-coordinate PRNG noise — the lockstep analog of
BatchedEnvironment.step (api/environment.py), preserving the reference step
ordering of lib.rs:68-87 (observe -> ctrl -> step -> reward -> terminate).

In-kernel policy (via :class:`policy.MLPPolicy`): the kernel stacks the
observation rows into an (n_obs, TILE) tile and runs the MLP forward pass
as real matmuls on the MXU against runtime weight inputs, so a policy can
act on every step *inside* the kernel — the piece that turns the physics
throughput number into an environment throughput number (the reference's
``Environment::step`` returns an observation every step, lib.rs:68-87;
VERDICT r3 missing #1).
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Callable, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..model import Model
from ..policy import MLPPolicy
from . import scalar_graph as sg


def supports(model: Model) -> bool:
    return sg.supports(model)


@dataclasses.dataclass(frozen=True)
class EnvHooks:
    """Task env-layer spec the kernel can inline.

    reward(q, v, ctrl) -> (TILE,) array: reward from the *post-step* state
    (lists of per-coordinate (TILE,) arrays).

    observe(q, v) -> list of n_obs (TILE,) rows: the task observation on
    the *pre-step* state — must equal ``Task.observe`` on the general path
    element for element (tested in test_megakernel).  Tasks that need body
    frames can derive them from the root coordinates (see suite/walker.py)
    or fall back to the general path.

    Reset distribution: qpos[i] resets to
        reset_qpos0[i] + U(-u_i, u_i) + N(0, s_i^2)
    with u = reset_noise * reset_mask (uniform amplitudes) and
    s = reset_qpos_sigma (gaussian sigmas); qvel resets to
    N(0, reset_qvel_sigma^2) per dof.  This is expressive enough to state
    every suite task's Task.init_episode exactly, so the kernel env and
    the API env agree in distribution (VERDICT r2 item 7).  Quaternion
    coordinates must have zero amplitude in BOTH vectors.
    """

    reward: Callable
    time_limit: float
    reset_noise: float = 0.0
    # (nq,) per-coordinate uniform amplitude multiplier for auto-reset
    # randomization (0 => no uniform noise on that coordinate).
    reset_mask: Sequence[float] | None = None
    # (nq,) auto-reset target; None => model qpos0.  Tasks whose episodes
    # start away from qpos0 (cartpole swingup: pole down) set this.
    reset_qpos0: Sequence[float] | None = None
    # (nq,) per-coordinate gaussian sigma (0 => no gaussian noise)
    reset_qpos_sigma: Sequence[float] | None = None
    # scalar gaussian sigma for every qvel dof (0 => reset to exactly 0)
    reset_qvel_sigma: float = 0.0
    # observation on the pre-step state: (q, v) -> list of n_obs rows
    observe: Callable | None = None
    n_obs: int = 0
    # when True, observe/reward receive a keyword argument ``fk`` — the
    # scalar-graph FK of the observed state (scalar_graph.build_fk): body
    # frames and site positions from the SAME expressions the step
    # computes, so frame-based rewards need no hand-derived twins
    needs_fk: bool = False
    # when True, observe receives a keyword argument ``sensordata`` — a
    # list of model.nsensordata scalar rows computed IN KERNEL by
    # scalar_graph.build_sensors at the observed state (pos/vel stages
    # fresh; accelerometer-family with the previous step's stage-1 qacc,
    # carried in the kernel state).  Matches the general path's post-step
    # sensor refresh (api/environment.py) element for element, so IMU/
    # frame-based observations ride the fast path (VERDICT r4 next #2).
    # Requires scalar_graph.sensors_supported(model).
    needs_sensors: bool = False


def build_rollout(
    model: Model,
    batch: int,
    steps_per_call: int,
    tile: int = 1024,
    hooks: EnvHooks | None = None,
    interpret: bool = False,
    emit_obs: bool = False,
    policy: MLPPolicy | None = None,
    traj_budget_bytes: int = 30 * 1024 * 1024,
    applied_forces: bool = False,
):
    """Compile a K-step rollout kernel.

    Base signature (``policy is None``): ``fn(qpos (nq,B), qvel (nv,B),
    act (max(na,1),B), ws (nv,B), time (1,B), ctrl (K,nu,B), seed (1,)
    int32)``.  With a policy, the ``ctrl`` input is replaced by the policy
    parameters: ``fn(qpos, qvel, act, ws, time, seed, *params_flat)`` where
    ``params_flat`` interleaves (W_1, b_1, ..., W_L, b_L) from
    ``MLPPolicy.init_params`` — runtime inputs, so updating the policy does
    not recompile the kernel.

    Outputs: ``(qpos', qvel', act', ws', time', reward_sum (1,B),
    diverged_count (1,B))`` plus, when ``emit_obs``:
    ``obs (K,n_obs,B), rewards (K,B), dones (K,B)`` and (with a policy)
    ``ctrls (K,nu,B)`` — the (s_t, a_t, r_t, done_t) trajectory, with
    ``obs[k]`` the pre-step observation the policy acted on at step k.

    Models with na == 0 carry one unused act row (Pallas block shapes must
    be nonzero); ``diverged_count`` is the number of divergence-triggered
    auto-resets per env over the K steps (SURVEY.md 5.5 observability).

    Mocap models (``model.nmocap > 0``) take one more runtime input
    ``mocap (7*nmocap, B)`` — per-env (pos3, quat4) rows in
    Data.mocap_pos/mocap_quat order, constant within one K-step call
    (the consumer moves targets between calls, the MuJoCo mocap idiom).
    Equality models (``model.neq > 0``) take ``eq_active (neq, B)``
    per-env 0/1 rows (Data.eq_active semantics; runtime toggling without
    recompile).  With ``applied_forces=True`` two more runtime inputs
    follow: ``qfrc (nv, B)`` and ``xfrc (6*nbody, B)`` — Data.qfrc_applied
    / xfrc_applied per-env perturbations, constant within one call (push
    randomization at kernel speed).  All appended AFTER the policy params
    in the signature, in the order mocap, eq_active, qfrc, xfrc.

    Layout note: state arrays are **coordinate-major** (nq, B) so each
    coordinate row is a full lane vector per tile.
    """
    assert supports(model)
    nq, nv, nu, na = model.nq, model.nv, model.nu, model.na
    nmocap, neq = model.nmocap, model.neq
    if emit_obs or policy is not None:
        assert hooks is not None and hooks.observe is not None, (
            "emit_obs/policy need EnvHooks.observe"
        )
    n_obs = hooks.n_obs if hooks is not None else 0
    needs_sensors = hooks is not None and hooks.needs_sensors
    if hooks is not None and hooks.observe is not None:
        # pass fk/sensordata only if the hook's signature takes them: a
        # task may set needs_fk for its REWARD while its observation reads
        # raw coordinates only (humanoid-run-policy-obs regression)
        import inspect

        sig = inspect.signature(hooks.observe)
        if any(p.kind == p.VAR_KEYWORD for p in sig.parameters.values()):
            _obs_accepts = None  # **kwargs: pass everything
        else:
            _obs_accepts = set(sig.parameters)
    else:
        _obs_accepts = None

    def observe_call(q, v, okw):
        kw = (okw if _obs_accepts is None
              else {k: x for k, x in okw.items() if k in _obs_accepts})
        return hooks.observe(q, v, **kw)
    if needs_sensors:
        assert sg.sensors_supported(model), (
            "needs_sensors requires every sensor in the kernel family "
            "(scalar_graph.sensors_supported)"
        )
        from ..model import SensorType as _ST

        sens_fn = sg.build_sensors(model)
        # accelerometer-family sensors read the previous step's stage-1
        # qacc, carried as an extra kernel state element
        carry_qacc = any(
            _ST(t) in sg._ACC_SENSORS for t in model.sensor_type
        )
    else:
        sens_fn = None
        carry_qacc = False

    # VMEM-aware tile sizing (r2 weak #7: the 100MB scoped-vmem ceiling was
    # a hard wall).  The Newton/Cholesky peak holds O(nv^2) live lane
    # vectors per tile; when the rough estimate would blow the ceiling,
    # halve the tile (the grid grows instead) rather than failing in
    # Mosaic.  Estimate calibrated on humanoid (nv=27 peaks ~5k vectors).
    na_rows = max(na, 1)   # Pallas block shapes must be nonzero
    nu_rows = max(nu, 1)
    est_vectors = (7 * nv * nv + 40 * nv + 6 * nq + 300 + 7 * nmocap + neq
                   + (nv + 6 * model.nbody if applied_forces else 0))
    if policy is not None:
        est_vectors += 2 * (n_obs + sum(policy.hidden) + nu)
    if needs_sensors:
        est_vectors += 2 * nv + model.nsensordata
    budget = 60 * 1024 * 1024
    while tile > 128 and est_vectors * tile * 4 > budget:
        tile //= 2
    while batch % tile:
        tile //= 2
    assert batch % tile == 0

    # --- trajectory streaming (VERDICT r4 next #5) ---
    # The ctrl input and the collected (obs, reward, done, ctrl) outputs
    # scale with K; instead of holding K x rows in VMEM for the program's
    # lifetime (which forced tile halving), the grid gains a SEQUENTIAL
    # second dimension over K-chunks: per chunk, Pallas streams a
    # (k_chunk, rows, tile) block HBM<->VMEM while the state carry stays
    # resident in the output blocks (their index map ignores the chunk
    # index, so Mosaic keeps them in VMEM across the whole row).
    per_step_rows = nu_rows if policy is None else 0
    if emit_obs:
        per_step_rows += n_obs + 2 + (nu_rows if policy is not None else 0)
    traj_budget = traj_budget_bytes
    while tile > 128 and per_step_rows * tile * 4 > traj_budget:
        tile //= 2
    k_chunk = steps_per_call
    if per_step_rows:
        for div in range(1, steps_per_call + 1):
            if steps_per_call % div:
                continue
            kc = steps_per_call // div
            if per_step_rows * kc * tile * 4 <= traj_budget:
                k_chunk = kc
                break
        else:
            k_chunk = 1
    n_chunks = steps_per_call // k_chunk
    step = sg.build_step(model, want_qacc=carry_qacc)
    fk_fn = sg.build_fk(model) if (hooks is not None
                                   and hooks.needs_fk) else None
    h = float(model.opt.timestep)
    k_steps = steps_per_call
    qpos0 = [float(x) for x in np.asarray(jax.device_get(model.qpos0))]
    if hooks is not None and hooks.reset_qpos0 is not None:
        qpos0 = [float(x) for x in hooks.reset_qpos0]
    if hooks is not None:
        # integer step-count limit: f32 `t += h` accumulated over thousands
        # of steps drifts enough to shift the reset boundary by a step, so
        # the kernel counts steps exactly and reconstructs t = n * h
        limit_n = int(math.floor((hooks.time_limit - 1e-6) / h)) + 1
        reset_noise = float(hooks.reset_noise)
        if hooks.reset_mask is None:
            reset_mask = [1.0] * nq
        else:
            reset_mask = [float(x) for x in hooks.reset_mask]
        uamp = [reset_noise * m for m in reset_mask]
        if hooks.reset_qpos_sigma is None:
            qsig = [0.0] * nq
        else:
            qsig = [float(x) for x in hooks.reset_qpos_sigma]
        vsig = float(hooks.reset_qvel_sigma)
    else:
        limit_n = None
        uamp = [0.0] * nq
        qsig = [0.0] * nq
        vsig = 0.0
    any_noise = any(uamp) or any(qsig) or vsig > 0
    explore = policy is not None and policy.explore_sigma > 0.0
    n_layers = 0 if policy is None else len(policy.hidden) + 1

    def kernel(*refs):
        i_ = 0
        qpos_ref, qvel_ref, act_ref, ws_ref, time_ref = refs[i_:i_ + 5]
        i_ += 5
        if carry_qacc:
            qa_ref = refs[i_]
            i_ += 1
        if policy is None:
            ctrl_ref = refs[i_]
            i_ += 1
        seed_ref = refs[i_]
        i_ += 1
        param_refs = []
        for _ in range(n_layers):
            param_refs.append((refs[i_], refs[i_ + 1]))
            i_ += 2
        if nmocap:
            mocap_ref = refs[i_]
            i_ += 1
        if neq:
            eqact_ref = refs[i_]
            i_ += 1
        if applied_forces:
            qfrc_ref, xfrc_ref = refs[i_:i_ + 2]
            i_ += 2
        (oq_ref, ov_ref, oa_ref, ows_ref, ot_ref) = refs[i_:i_ + 5]
        i_ += 5
        if carry_qacc:
            oqa_ref = refs[i_]
            i_ += 1
        orew_ref, odiv_ref = refs[i_:i_ + 2]
        i_ += 2
        if emit_obs:
            oobs_ref, orews_ref, odones_ref = refs[i_:i_ + 3]
            i_ += 3
            if policy is not None:
                octrl_ref = refs[i_]
                i_ += 1

        j = pl.program_id(1)  # sequential K-chunk index

        if (any_noise or explore) and not interpret:
            # per-(tile, chunk) PRNG stream for reset/exploration noise
            pltpu.prng_seed(
                seed_ref[0] + pl.program_id(0) * n_chunks + j
            )

        t_in = time_ref[0, :]

        # chunk 0 initializes the carry in the OUTPUT blocks (their index
        # maps ignore j, so Mosaic keeps them VMEM-resident across the
        # whole chunk row for this tile); later chunks resume from them
        @pl.when(j == 0)
        def _init_carry():
            for i in range(nq):
                oq_ref[i, :] = qpos_ref[i, :]
            for i in range(nv):
                ov_ref[i, :] = qvel_ref[i, :]
                ows_ref[i, :] = ws_ref[i, :]
            for i in range(na_rows):
                oa_ref[i, :] = act_ref[i, :]
            if carry_qacc:
                for i in range(nv):
                    oqa_ref[i, :] = qa_ref[i, :]
            ot_ref[0, :] = t_in
            orew_ref[0, :] = jnp.zeros_like(t_in)
            odiv_ref[0, :] = jnp.zeros_like(t_in)

        q0 = tuple(oq_ref[i, :] for i in range(nq))
        v0 = tuple(ov_ref[i, :] for i in range(nv))
        a0 = tuple(oa_ref[i, :] for i in range(na))
        w0 = tuple(ows_ref[i, :] for i in range(nv))
        qa0 = (tuple(oqa_ref[i, :] for i in range(nv)) if carry_qacc
               else ())
        t0 = ot_ref[0, :]
        # exact step counter (t0 is always an exact multiple of h here)
        n0 = jnp.round(t0 * (1.0 / h)).astype(jnp.int32)
        rew0 = orew_ref[0, :]
        div0 = odiv_ref[0, :]

        def mat_row(x):
            """Materialize a scalar-graph value as a (TILE,) lane vector."""
            if sg._is_const(x):
                return jnp.full_like(t0, float(x))
            return x.astype(t0.dtype) if x.dtype != t0.dtype else x

        # runtime mocap poses / equality-active lanes (chunk-invariant
        # per-env inputs; None when the model has neither)
        moc = (list(mocap_ref[i, :] for i in range(7 * nmocap))
               if nmocap else None)
        eqa = (list(eqact_ref[e, :] != 0.0 for e in range(neq))
               if neq else None)
        if applied_forces:
            qfrc_ext = [qfrc_ref[i, :] for i in range(nv)]
            xfrc_ext = [xfrc_ref[i, :] for i in range(6 * model.nbody)]
        else:
            qfrc_ext = xfrc_ext = None

        def std_normals(count, k, salt):
            """(count, TILE) standard normals: hardware PRNG + Box-Muller
            on TPU; the threefry jax.random stream in interpret mode (the
            HLO interpreter cannot lower the TPU PRNG primitives)."""
            if not interpret:
                bits = pltpu.prng_random_bits((2 * count,) + t0.shape)
                s = pltpu.bitcast(bits, jnp.int32).astype(t0.dtype) * (
                    2.0 ** -31
                )  # [-1, 1)
                # clamp u1 away from 0: bits*2^-31 ROUNDS TO EXACTLY 1.0
                # in f32 for bits near 2^31 (≈2^-25 of samples), and
                # log(0) = -inf poisons the Box-Muller normal (observed:
                # one -inf ctrl per ~5M samples)
                u1 = jnp.maximum(0.5 * (1.0 - s[:count]), 1e-12)  # (0, 1]
                u2 = 0.5 * (s[count:] + 1.0)         # [0, 1)
                return jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(
                    (2.0 * math.pi) * u2
                )
            key = jax.random.fold_in(
                jax.random.fold_in(jax.random.PRNGKey(salt), seed_ref[0]), k
            )
            return jax.random.normal(key, (count,) + t0.shape, dtype=t0.dtype)

        def body(k, carry):
            q, v, a, w, qa, n, rew, ndiv = carry
            gk = j * k_chunk + k   # global step index (PRNG uniqueness)

            # ---- observe (pre-step state: the policy input) ----
            if hooks is not None and hooks.observe is not None and (
                    emit_obs or policy is not None):
                okw = {}
                if fk_fn is not None:
                    okw["fk"] = fk_fn(list(q), mocap=moc)
                if needs_sensors:
                    okw["sensordata"] = sens_fn(
                        list(q), list(v),
                        qacc=list(qa) if carry_qacc else None,
                        time=n.astype(t0.dtype) * h,
                        fk=okw.get("fk"), mocap=moc,
                    )
                obs_rows = observe_call(list(q), list(v), okw)
                assert len(obs_rows) == n_obs, (len(obs_rows), n_obs)
                obs_mat = jnp.stack([mat_row(o) for o in obs_rows])
            else:
                obs_mat = None

            # ---- action: in-kernel policy or the ctrl input ----
            if policy is not None:
                x = obs_mat
                for (w_ref, b_ref) in param_refs:
                    x = jnp.tanh(
                        jnp.dot(w_ref[...], x,
                                preferred_element_type=t0.dtype)
                        + b_ref[...]
                    )
                cmat = x  # (nu, TILE)
                if explore:
                    cmat = cmat + policy.explore_sigma * std_normals(
                        nu, gk, 13
                    )
                c = tuple(cmat[u, :] for u in range(nu))
            else:
                cmat = None
                c = tuple(ctrl_ref[k, u, :] for u in range(nu))

            if emit_obs:
                oobs_ref[k] = obs_mat
                if policy is not None:
                    octrl_ref[k] = cmat

            if carry_qacc:
                q, v, a, w, qacc1 = step(
                    list(q), list(v), list(a), list(w), list(c),
                    mocap=moc, eq_act=eqa, qfrc_ext=qfrc_ext,
                    xfrc_ext=xfrc_ext,
                )
            else:
                q, v, a, w = step(list(q), list(v), list(a), list(w),
                                  list(c), mocap=moc, eq_act=eqa,
                                  qfrc_ext=qfrc_ext, xfrc_ext=xfrc_ext)
                qacc1 = None
            n = n + 1

            # divergence + time-limit -> masked auto-reset (bad computed
            # BEFORE the reward so a diverged state's NaN reward can be
            # masked instead of poisoning reward_sum / the trajectory)
            bad = jnp.zeros_like(n, dtype=jnp.bool_)
            for val in list(q) + list(v):
                if not sg._is_const(val):
                    bad = bad | ~jnp.isfinite(val) | (jnp.abs(val) > 1e10)
            if limit_n is not None:
                done = bad | (n >= limit_n)
            else:
                done = bad
            # observability (SURVEY.md 5.5): per-env divergence-reset count
            ndiv = ndiv + bad.astype(ndiv.dtype)

            if hooks is not None:
                if fk_fn is not None:
                    rew_t = mat_row(hooks.reward(list(q), list(v), list(c),
                                                 fk=fk_fn(list(q),
                                                          mocap=moc)))
                else:
                    rew_t = mat_row(hooks.reward(list(q), list(v), list(c)))
                # diverged step: the state is garbage and the lane resets;
                # a NaN/inf reward must not reach the accumulator or the
                # collected trajectory (the done flag marks the boundary)
                rew_t = jnp.where(bad, 0.0, rew_t)
                rew = rew + rew_t
            else:
                rew_t = None

            if emit_obs:
                orews_ref[k] = rew_t
                odones_ref[k] = done.astype(t0.dtype)

            if any_noise and not interpret:
                # one hardware PRNG block: nq uniforms + (nq + nv) standard
                # normals via Box-Muller (sqrt(-2 ln u1) cos(2 pi u2))
                nn = nq + nv
                bits = pltpu.prng_random_bits((nq + 2 * nn,) + n.shape)
                s = pltpu.bitcast(bits, jnp.int32).astype(t0.dtype) * (
                    2.0 ** -31
                )  # [-1, 1)
                uni = s[:nq]
                # clamped like std_normals (f32 rounding can give u1=0)
                u1 = jnp.maximum(
                    0.5 * (1.0 - s[nq : nq + nn]), 1e-12
                )                                          # (0, 1]
                u2 = 0.5 * (s[nq + nn :] + 1.0)            # [0, 1)
                z = jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(
                    (2.0 * math.pi) * u2
                )
                q_reset = [
                    qpos0[i]
                    + (uamp[i] * uni[i] if uamp[i] else 0.0)
                    + (qsig[i] * z[i] if qsig[i] else 0.0)
                    for i in range(nq)
                ]
                v_reset = [
                    vsig * z[nq + i] if vsig else 0.0 for i in range(nv)
                ]
            elif any_noise:
                # interpret mode: threefry-based jax.random stream instead
                # (statistically equivalent distributions)
                key = jax.random.fold_in(
                    jax.random.fold_in(jax.random.PRNGKey(7), seed_ref[0]),
                    gk,
                )
                ku, kz = jax.random.split(key)
                u = jax.random.uniform(
                    ku, (nq,) + n.shape, minval=-1.0, maxval=1.0,
                    dtype=t0.dtype,
                )
                z = jax.random.normal(kz, (nq + nv,) + n.shape, dtype=t0.dtype)
                q_reset = [
                    qpos0[i]
                    + (uamp[i] * u[i] if uamp[i] else 0.0)
                    + (qsig[i] * z[i] if qsig[i] else 0.0)
                    for i in range(nq)
                ]
                v_reset = [
                    vsig * z[nq + i] if vsig else 0.0 for i in range(nv)
                ]
            else:
                q_reset = qpos0
                v_reset = [0.0] * nv
            q = tuple(jnp.where(done, q_reset[i], q[i]) for i in range(nq))
            v = tuple(jnp.where(done, v_reset[i], v[i]) for i in range(nv))
            a = tuple(jnp.where(done, 0.0, a[i]) for i in range(na))
            w = tuple(jnp.where(done, 0.0, w[i]) for i in range(nv))
            if carry_qacc:
                # reset lanes: qacc carry -> 0 (the general path's fresh
                # make_data state; the boundary observation is never
                # reported there, so this is unobservable in comparisons)
                zero = jnp.zeros_like(t0)
                qa = tuple(
                    jnp.where(done, zero, qacc1[i]) for i in range(nv)
                )
            n = jnp.where(done, 0, n)
            return (q, v, a, w, qa, n, rew, ndiv)

        q, v, a, w, qa, n, rew, ndiv = jax.lax.fori_loop(
            0, k_chunk, body, (q0, v0, a0, w0, qa0, n0, rew0, div0)
        )

        for i in range(nq):
            oq_ref[i, :] = q[i]
        for i in range(nv):
            ov_ref[i, :] = v[i]
            ows_ref[i, :] = w[i]
        if carry_qacc:
            for i in range(nv):
                oqa_ref[i, :] = qa[i]
        for i in range(na):
            oa_ref[i, :] = a[i]
        ot_ref[0, :] = n.astype(t0.dtype) * h
        orew_ref[0, :] = rew
        odiv_ref[0, :] = ndiv

    # chunk index j is the FAST (innermost, sequential) grid dimension:
    # for each env tile i, chunks run j = 0..n_chunks-1 in order, carrying
    # state in the j-invariant output blocks
    grid = (batch // tile, n_chunks)

    def spec(rows):
        return pl.BlockSpec((rows, tile), lambda i, j: (0, i),
                            memory_space=pltpu.VMEM)

    def traj_spec(rows):
        return pl.BlockSpec((k_chunk, rows, tile), lambda i, j: (j, 0, i),
                            memory_space=pltpu.VMEM)

    traj2_spec = pl.BlockSpec((k_chunk, tile), lambda i, j: (j, i),
                              memory_space=pltpu.VMEM)
    seed_spec = pl.BlockSpec(memory_space=pltpu.SMEM)

    def full_spec(arr_shape):
        # replicated (non-grid-mapped) input: policy weights
        nd = len(arr_shape)
        return pl.BlockSpec(arr_shape, lambda i, j: (0,) * nd,
                            memory_space=pltpu.VMEM)

    # large models (humanoid: nv=27, ~5k live lane-vectors at the Cholesky /
    # Newton peak) exceed the default 16MB scoped-vmem stack; raise the
    # Mosaic limit toward the physical VMEM size.  The env-tile dimension
    # is parallel; the K-chunk dimension is sequential (state carry).
    compiler_params = pltpu.CompilerParams(
        vmem_limit_bytes=100 * 1024 * 1024,
        dimension_semantics=("parallel", "arbitrary"),
    )

    n_state = 6 if carry_qacc else 5

    def fn(*args):
        state_in = args[:n_state]
        rest = args[n_state:]
        qpos = state_in[0]
        dtype = qpos.dtype
        in_specs = [spec(nq), spec(nv), spec(na_rows), spec(nv), spec(1)]
        if carry_qacc:
            in_specs.append(spec(nv))
        n_extra = ((1 if nmocap else 0) + (1 if neq else 0)
                   + (2 if applied_forces else 0))
        extra = rest[len(rest) - n_extra:] if n_extra else ()
        rest = rest[:len(rest) - n_extra] if n_extra else rest
        if policy is None:
            ctrl, seed = rest[0], rest[1]
            params_flat = rest[2:]
            in_specs.append(
                pl.BlockSpec((k_chunk, nu_rows, tile),
                             lambda i, j: (j, 0, i),
                             memory_space=pltpu.VMEM)
            )
            inputs = state_in + (ctrl, seed)
        else:
            seed = rest[0]
            params_flat = tuple(rest[1:])
            assert len(params_flat) == 2 * n_layers, len(params_flat)
            inputs = state_in + (seed,) + params_flat
        in_specs.append(seed_spec)
        for p in params_flat:
            in_specs.append(full_spec(p.shape))
        if nmocap:
            in_specs.append(spec(7 * nmocap))
        if neq:
            in_specs.append(spec(neq))
        if applied_forces:
            in_specs.append(spec(nv))
            in_specs.append(spec(6 * model.nbody))
        inputs = inputs + tuple(extra)

        state_specs = [spec(nq), spec(nv), spec(na_rows), spec(nv), spec(1)]
        state_shapes = [
            jax.ShapeDtypeStruct((nq, batch), dtype),
            jax.ShapeDtypeStruct((nv, batch), dtype),
            jax.ShapeDtypeStruct((na_rows, batch), dtype),
            jax.ShapeDtypeStruct((nv, batch), dtype),
            jax.ShapeDtypeStruct((1, batch), dtype),
        ]
        if carry_qacc:
            state_specs.append(spec(nv))
            state_shapes.append(jax.ShapeDtypeStruct((nv, batch), dtype))
        out_specs = state_specs + [spec(1), spec(1)]
        out_shape = state_shapes + [
            jax.ShapeDtypeStruct((1, batch), dtype),
            jax.ShapeDtypeStruct((1, batch), dtype),
        ]
        if emit_obs:
            out_specs += [traj_spec(n_obs), traj2_spec, traj2_spec]
            out_shape += [
                jax.ShapeDtypeStruct((k_steps, n_obs, batch), dtype),
                jax.ShapeDtypeStruct((k_steps, batch), dtype),
                jax.ShapeDtypeStruct((k_steps, batch), dtype),
            ]
            if policy is not None:
                out_specs.append(traj_spec(nu_rows))
                out_shape.append(
                    jax.ShapeDtypeStruct((k_steps, nu_rows, batch), dtype)
                )
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=tuple(out_specs),
            out_shape=tuple(out_shape),
            interpret=interpret,
            compiler_params=None if interpret else compiler_params,
        )(*inputs)

    return jax.jit(fn, donate_argnums=tuple(range(n_state)))
