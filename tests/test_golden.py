"""Golden-trajectory tests: N-step rollouts vs CPU MuJoCo under identical
ctrl sequences (SURVEY.md §4 item 2, BASELINE.md correctness metric)."""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

import fixtures
from oxide_control_tpu import load_model_from_xml
from oxide_control_tpu.physics import forward as fwd
from oxide_control_tpu.state import make_data


def rollout_mujoco(xml, qpos, qvel, ctrls):
    ref = mujoco.MjModel.from_xml_string(xml)
    rd = mujoco.MjData(ref)
    rd.qpos[:] = qpos
    rd.qvel[:] = qvel
    out_qpos, out_qvel = [], []
    for c in ctrls:
        rd.ctrl[:] = c
        mujoco.mj_step(ref, rd)
        out_qpos.append(rd.qpos.copy())
        out_qvel.append(rd.qvel.copy())
    return np.array(out_qpos), np.array(out_qvel)


def rollout_ours(xml, qpos, qvel, ctrls):
    m = load_model_from_xml(xml)
    d = make_data(m)
    d = d.replace(qpos=jnp.asarray(qpos), qvel=jnp.asarray(qvel))

    def body(d, ctrl):
        d = d.replace(ctrl=ctrl)
        d = fwd.step(m, d)
        return d, (d.qpos, d.qvel)

    _, (qp, qv) = jax.lax.scan(body, d, jnp.asarray(ctrls))
    return np.asarray(qp), np.asarray(qv)


def compare_windowed(xml, nsteps, window, seed, tol, ctrl_scale=1.0,
                     vel_tol=None):
    """Windowed golden comparison for chaotic contact-rich systems.

    A single long rollout amplifies any sub-ULP solver difference through the
    system's Lyapunov exponent (humanoid contact dynamics are chaotic), so a
    full-horizon max-abs bound measures chaos, not correctness.  Instead we
    walk along the CPU-MuJoCo reference trajectory and, every `window` steps,
    re-sync our state (qpos/qvel/warmstart) to MuJoCo's and compare the next
    `window` steps.  This checks correctness at every phase of the trajectory
    (airborne, contact-rich, sliding) with no chaotic amplification.
    """
    ref = mujoco.MjModel.from_xml_string(xml)
    rd = mujoco.MjData(ref)
    rng = np.random.default_rng(seed)
    nu = ref.nu
    holds = rng.uniform(-ctrl_scale, ctrl_scale, (nsteps // 20 + 1, nu))
    ctrls = np.repeat(holds, 20, axis=0)[:nsteps]

    m = load_model_from_xml(xml)
    d0 = make_data(m)

    def run_window(qpos, qvel, warm, act, cs):
        d = d0.replace(qpos=jnp.asarray(qpos), qvel=jnp.asarray(qvel),
                       qacc_warmstart=jnp.asarray(warm),
                       act=jnp.asarray(act))

        def body(d, ctrl):
            d = d.replace(ctrl=ctrl)
            d = fwd.step(m, d)
            return d, (d.qpos, d.qvel)

        _, (qp, qv) = jax.lax.scan(body, d, jnp.asarray(cs))
        return qp, qv

    run_window = jax.jit(run_window)
    worst_q = worst_v = 0.0
    for start in range(0, nsteps, window):
        cs = ctrls[start:start + window]
        sync = (rd.qpos.copy(), rd.qvel.copy(), rd.qacc_warmstart.copy(),
                rd.act.copy())
        qp_ref, qv_ref = [], []
        for c in cs:
            rd.ctrl[:] = c
            mujoco.mj_step(ref, rd)
            qp_ref.append(rd.qpos.copy())
            qv_ref.append(rd.qvel.copy())
        qp, qv = run_window(*sync, cs)
        worst_q = max(worst_q, np.max(np.abs(qp - np.array(qp_ref))))
        worst_v = max(worst_v, np.max(np.abs(qv - np.array(qv_ref))))
    assert worst_q < tol, f"windowed qpos err {worst_q:.3e} >= {tol}"
    vel_tol = tol * 10 if vel_tol is None else vel_tol
    assert worst_v < vel_tol, f"windowed qvel err {worst_v:.3e} >= {vel_tol}"
    return worst_q, worst_v


def compare(xml, nsteps, seed, tol, ctrl_scale=1.0, init=None, vel_tol=None):
    ref = mujoco.MjModel.from_xml_string(xml)
    rng = np.random.default_rng(seed)
    qpos = ref.qpos0.copy()
    qvel = np.zeros(ref.nv)
    if init is not None:
        qpos, qvel = init
    # smooth random ctrl: piecewise-constant over 20-step holds
    nu = ref.nu
    holds = rng.uniform(-ctrl_scale, ctrl_scale, (nsteps // 20 + 1, nu))
    ctrls = np.repeat(holds, 20, axis=0)[:nsteps]
    qp_ref, qv_ref = rollout_mujoco(xml, qpos, qvel, ctrls)
    qp, qv = rollout_ours(xml, qpos, qvel, ctrls)
    err_q = np.max(np.abs(qp - qp_ref))
    err_v = np.max(np.abs(qv - qv_ref))
    assert err_q < tol, f"qpos traj err {err_q:.3e} >= {tol}"
    vel_tol = tol * 10 if vel_tol is None else vel_tol
    assert err_v < vel_tol, f"qvel traj err {err_v:.3e} >= {vel_tol}"
    return err_q, err_v


def test_pendulum_trajectory():
    compare(fixtures.PENDULUM, 1000, 0, 1e-8)


def test_cartpole_trajectory():
    # drives the cart into its slider limits -> exercises limit rows
    compare(fixtures.CARTPOLE, 1000, 1, 1e-8)


def test_ball_joint_trajectory():
    compare(fixtures.BALL_JOINT, 500, 2, 1e-8)


def test_free_body_drop():
    # sphere dropped with lateral+angular velocity: impacts, friction, roll
    init = (
        np.array([0.1, -0.2, 0.5, 1, 0, 0, 0]),
        np.array([1.0, 0.5, 0.0, 2.0, -1.0, 0.5]),
    )
    compare(fixtures.FREE_BODY, 1000, 3, 1e-6, init=init)


def test_walker_trajectory():
    # contact-rich planar walker accumulates ~3e-6 qpos error over 500 steps
    # (our line search is exact; MuJoCo's stops at ls_tolerance), so the
    # bound here is looser than the smooth-only models.
    compare(fixtures.PLANAR_WALKER, 500, 4, 1e-4, vel_tol=1e-2)


def test_pendulum_rk4():
    xml = fixtures.PENDULUM.replace(
        '<option timestep="0.002"', '<option integrator="RK4" timestep="0.002"'
    )
    compare(xml, 500, 5, 1e-8)


def test_determinism():
    """Same seed -> bit-identical trajectories (SURVEY.md §4 item 5)."""
    qp1, qv1 = rollout_ours(
        fixtures.PENDULUM, np.array([0.3]), np.array([0.1]),
        np.full((100, 1), 0.5),
    )
    qp2, qv2 = rollout_ours(
        fixtures.PENDULUM, np.array([0.3]), np.array([0.1]),
        np.full((100, 1), 0.5),
    )
    np.testing.assert_array_equal(qp1, qp2)
    np.testing.assert_array_equal(qv1, qv2)


def test_free_body_pgs_solver():
    """Solver-option parity: PGS dual solver vs MuJoCo PGS."""
    xml = fixtures.FREE_BODY.replace(
        'solver="CG" iterations="30"', 'solver="PGS" iterations="30"'
    )
    init = (
        np.array([0.1, -0.2, 0.5, 1, 0, 0, 0]),
        np.array([1.0, 0.5, 0.0, 2.0, -1.0, 0.5]),
    )
    # PGS converges linearly, so the two implementations agree less tightly
    # than Newton (which reaches the optimum): ~2e-4 over 500 steps.
    compare(fixtures.FREE_BODY.replace(
        'solver="CG" iterations="30"', 'solver="PGS" iterations="30"'
    ), 500, 3, 1e-3, init=init, vel_tol=1e-1)


def test_frictionloss_pendulum():
    """Dof friction loss (Huber-cost rows) vs MuJoCo: a pendulum with high
    frictionloss sticks instead of swinging; trajectories must match."""
    xml = fixtures.PENDULUM.replace(
        'damping="0.1"', 'damping="0.1" frictionloss="0.4"'
    )
    compare(xml, 1000, 7, 1e-8)


def test_frictionloss_walker():
    """Friction loss on a contact-rich model: friction rows must coexist
    with limit + contact rows in the same solve."""
    xml = fixtures.PLANAR_WALKER.replace(
        '<joint damping="0.1" armature="0.01"/>',
        '<joint damping="0.1" armature="0.01" frictionloss="0.1"/>',
    )
    compare(xml, 500, 8, 1e-4, vel_tol=1e-2)


def test_frictionloss_disable_flag():
    """<flag frictionloss="disable"/> must drop the friction rows."""
    xml = fixtures.PENDULUM.replace(
        'damping="0.1"', 'damping="0.1" frictionloss="0.4"'
    ).replace(
        '<option timestep="0.002" gravity="0 0 -9.81"/>',
        '<option timestep="0.002" gravity="0 0 -9.81">'
        '<flag frictionloss="disable"/></option>',
    )
    compare(xml, 500, 7, 1e-8)
