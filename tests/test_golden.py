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


def test_weld_equality():
    """Weld equality (6 rows: 3 translation + 3 rotation with torquescale)
    vs MuJoCo, including a ball joint on the welded body."""
    # stiff equality rows (k ~ 2.8e3) amplify sub-ULP solver differences
    # exponentially, so compare in re-synced windows (single-step parity is
    # exact: aref/qacc match MuJoCo to 1e-10 at synced states)
    compare_windowed(fixtures.WELD_PENDULUM, 300, 25, 9, 1e-6,
                     ctrl_scale=0.3, vel_tol=1e-4)


def test_weld_default_relpose():
    """All-zero relpose quat must resolve to the qpos0 relative pose
    (MuJoCo compiler semantics)."""
    compare_windowed(fixtures.WELD_DEFAULT, 300, 25, 10, 1e-6,
                     ctrl_scale=0.3, vel_tol=1e-4)


def test_ball_joint_limit():
    """Limited ball joint: |rotation angle| row with J = -axis."""
    init = (
        np.array([1.0, 0, 0, 0]),
        np.array([2.0, -1.5, 1.0]),  # swing hard into the 0.5 rad limit
    )
    compare(fixtures.BALL_LIMIT, 500, 11, 1e-7, init=init, vel_tol=1e-5)


def test_implicitfast_velocity_actuator():
    """implicitfast: (M - h*D) dv = h*qfrc with D = damping + actuator
    velocity-gain terms; a velocity servo makes D differ from plain
    damping, distinguishing this from the Euler eulerdamp branch."""
    xml = fixtures.PENDULUM.replace(
        '<option timestep="0.002"', '<option integrator="implicitfast" timestep="0.002"'
    ).replace(
        '<motor name="torque" joint="hinge" gear="1.5" ctrlrange="-1 1"/>',
        '<velocity name="servo" joint="hinge" kv="3.0" ctrlrange="-1 1"/>',
    )
    compare(xml, 1000, 12, 1e-8)


def test_implicitfast_cheetah_like():
    """implicitfast on a contact-rich model (walker fixture)."""
    xml = fixtures.PLANAR_WALKER.replace(
        '<option timestep="0.002" solver="CG" iterations="30" tolerance="0"/>',
        '<option timestep="0.002" integrator="implicitfast" solver="CG" '
        'iterations="30" tolerance="0"/>',
    )
    compare(xml, 500, 13, 1e-4, vel_tol=1e-2)


def test_implicit_full():
    """Full implicit: adds the RNE Coriolis derivative (exact jacfwd) and
    an LU solve; the ball pendulum has strong gyroscopic coupling."""
    xml = fixtures.BALL_JOINT.replace(
        '<option timestep="0.002"/>',
        '<option timestep="0.002" integrator="implicit"/>',
    )
    init = (np.array([1.0, 0, 0, 0]), np.array([3.0, -2.0, 4.0]))
    compare(xml, 1000, 14, 1e-8, init=init)


def test_condim4_torsional():
    """condim 4: torsional friction rows (rotation about the normal) spin
    down a twirling sphere; 6 pyramid rows per contact."""
    init = (
        np.array([0.0, 0.0, 0.145, 1, 0, 0, 0]),
        np.array([0.2, 0.0, 0.0, 0.0, 0.0, 8.0]),  # fast spin about z
    )
    compare(fixtures.SPIN_SPHERE, 800, 15, 1e-6, init=init, vel_tol=1e-4)


def test_condim6_rolling():
    """condim 6: rolling friction rows decay a rolling sphere; 10 pyramid
    rows per contact."""
    init = (
        np.array([0.0, 0.0, 0.145, 1, 0, 0, 0]),
        np.array([1.5, -0.5, 0.0, 2.0, 6.0, 3.0]),
    )
    compare(fixtures.ROLL_SPHERE, 800, 16, 1e-6, init=init, vel_tol=1e-4)


_ELLIPTIC_SPHERE = """
<mujoco>
  <option cone="elliptic" impratio="{ir}" solver="{solver}" iterations="30"
          tolerance="0" timestep="0.002"/>
  <worldbody>
    <geom name="floor" type="plane" size="5 5 .1" friction="0.4 0.1 0.01"/>
    <body pos="0 0 0.145">
      <freejoint/>
      <geom name="ball" type="sphere" size="0.15" mass="1"
            friction="0.4 0.3 0.05" condim="{condim}"/>
    </body>
  </worldbody>
</mujoco>
"""


def test_elliptic_cone_newton():
    """Elliptic friction cone (condim 6, impratio 2) under Newton: the
    cone force is the D^-1-metric projection onto the friction cone; all
    three zones (quadratic/cone/zero) are exercised by a bouncing rolling
    sphere.  Single-state qacc parity with MuJoCo is 1e-13."""
    xml = _ELLIPTIC_SPHERE.format(ir=2.0, solver="Newton", condim=6)
    init = (
        np.array([0.0, 0.0, 0.3, 1, 0, 0, 0]),
        np.array([1.5, -0.5, 0.0, 2.0, 6.0, 3.0]),
    )
    compare(xml, 800, 17, 1e-6, init=init, vel_tol=1e-4)


def test_elliptic_cone_cg_condim3():
    """Elliptic condim 3 under the CG solver (bisection line search)."""
    xml = _ELLIPTIC_SPHERE.format(ir=1.0, solver="CG", condim=3)
    init = (
        np.array([0.0, 0.0, 0.2, 1, 0, 0, 0]),
        np.array([1.0, 0.5, 0.0, 2.0, -1.0, 0.5]),
    )
    compare(xml, 500, 18, 1e-5, init=init, vel_tol=1e-3)


def test_site_transmission():
    """Site-transmission actuators (mjTRN_SITE, no refsite): the 6D gear
    wrench acts in the site frame through the site Jacobian."""
    compare(fixtures.SITE_THRUSTER, 600, 19, 1e-7, vel_tol=1e-5)


def test_box_stack_drop():
    """Box dropped onto a box: SAT + face-clip box-box contacts (up to 8
    lanes) and plane-box, settling into face-face rest."""
    compare_windowed(fixtures.BOX_STACK, 400, 25, 20, 1e-6, vel_tol=1e-4)


def test_capsule_on_box():
    """Capsule dropped flat onto a box face: end-sphere capsule-box lanes."""
    compare_windowed(fixtures.CAPSULE_ON_BOX, 400, 25, 21, 1e-6, vel_tol=1e-4)


def test_cylinder_drop():
    """Upright cylinder drop (3-rim-contact flat case) plus a sphere that
    lands beside it; exercises plane-cylinder lanes at rest and on impact."""
    compare_windowed(fixtures.CYLINDER_DROP, 400, 25, 22, 1e-6, vel_tol=1e-4)


def test_fixed_tendon():
    """Fixed tendon: coupled-joint length/velocity, dead-band spring,
    damping, tendon limits + friction-loss rows, tendon-transmission
    actuator — all vs MuJoCo."""
    compare(fixtures.TENDON_FINGER, 1000, 23, 1e-8)


def test_ellipsoid_drop():
    """Plane-ellipsoid support-point contact: tumbling ellipsoid drop."""
    compare_windowed(fixtures.ELLIPSOID_DROP, 400, 25, 24, 1e-6, vel_tol=1e-4)


SPATIAL_TENDON_XML = """
<mujoco model="spatial_tendon_arm">
  <option timestep="0.002" solver="Newton" iterations="20" tolerance="0"/>
  <worldbody>
    <site name="anchor" pos="0 0 1.2"/>
    <body name="upper" pos="0 0 1">
      <joint name="shoulder" type="hinge" axis="0 1 0" damping="0.1"/>
      <geom name="ug" type="capsule" fromto="0 0 0 0.3 0 0" size="0.03" mass="1"/>
      <site name="mid" pos="0.15 0 0.03"/>
      <body name="lower" pos="0.3 0 0">
        <joint name="elbow" type="hinge" axis="0 1 0" damping="0.05"/>
        <geom name="lg" type="capsule" fromto="0 0 0 0.25 0 0" size="0.025" mass="0.5"/>
        <site name="tip" pos="0.25 0 0"/>
      </body>
    </body>
  </worldbody>
  <tendon>
    <spatial name="string" stiffness="15" damping="0.5" springlength="0.5"
             limited="true" range="0.2 0.9" frictionloss="0.1">
      <site site="anchor"/>
      <site site="mid"/>
      <site site="tip"/>
    </spatial>
  </tendon>
  <actuator>
    <motor name="pull" tendon="string" gear="1.5" ctrlrange="-1 1"/>
    <motor name="drive" joint="shoulder" gear="1" ctrlrange="-1 1"/>
  </actuator>
  <sensor>
    <tendonpos tendon="string"/>
    <tendonvel tendon="string"/>
  </sensor>
</mujoco>
"""


def test_spatial_tendon_golden():
    """Site-routed spatial tendon (VERDICT r2 item 4): length/moment via
    straight segments, spring/damper passive forces, limit + friction rows,
    tendon actuator transmission, tendonpos/vel sensors — all vs MuJoCo at
    fixed-tendon tolerances."""
    m = load_model_from_xml(SPATIAL_TENDON_XML)
    ref = mujoco.MjModel.from_xml_string(SPATIAL_TENDON_XML)
    # compile-time parity: rest length + invweight at qpos0
    np.testing.assert_allclose(
        np.asarray(m.tendon_invweight0), ref.tendon_invweight0, atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(m.tendon_lengthspring), ref.tendon_lengthspring, atol=1e-12
    )
    compare(SPATIAL_TENDON_XML, 300, seed=21, tol=1e-8)


def test_spatial_tendon_pulley_golden():
    """Pulley divisors: two branches sharing one tendon length budget."""
    xml = """
    <mujoco>
      <option timestep="0.002" solver="Newton" iterations="20" tolerance="0"/>
      <worldbody>
        <site name="a0" pos="-0.3 0 1.2"/>
        <site name="a1" pos="0.3 0 1.2"/>
        <body name="b1" pos="-0.3 0 1">
          <joint name="s1" type="slide" axis="0 0 1" damping="0.2"/>
          <geom type="sphere" size="0.05" mass="0.5"/>
          <site name="p1" pos="0 0 0.05"/>
        </body>
        <body name="b2" pos="0.3 0 1">
          <joint name="s2" type="slide" axis="0 0 1" damping="0.2"/>
          <geom type="sphere" size="0.05" mass="0.8"/>
          <site name="p2" pos="0 0 0.05"/>
        </body>
      </worldbody>
      <tendon>
        <spatial name="rope" stiffness="30" springlength="0.3" damping="1">
          <site site="p1"/>
          <site site="a0"/>
          <pulley divisor="2"/>
          <site site="a1"/>
          <site site="p2"/>
        </spatial>
      </tendon>
    </mujoco>
    """
    compare(xml, 400, seed=23, tol=1e-8)


WRAP_ARM_XML = """
<mujoco model="wrapped_tendon_arm">
  <option timestep="0.002" solver="Newton" iterations="20" tolerance="0"/>
  <worldbody>
    <site name="anchor" pos="-0.05 0 1.25"/>
    <body name="upper" pos="0 0 1">
      <joint name="shoulder" type="hinge" axis="0 1 0" damping="0.1"/>
      <geom name="ug" type="capsule" fromto="0 0 0 0.3 0 0" size="0.03"
            mass="1"/>
      <geom name="pulleyg" type="sphere" pos="0.3 0 0.0" size="0.05"
            mass="0.05" contype="0" conaffinity="0"/>
      <site name="pside" pos="0.3 0 0.08"/>
      <body name="lower" pos="0.3 0 0">
        <joint name="elbow" type="hinge" axis="0 1 0" damping="0.05"
               range="-150 0" limited="true"/>
        <geom name="lg" type="capsule" fromto="0 0 0 0.25 0 0" size="0.025"
              mass="0.5"/>
        <site name="tip" pos="0.25 0 0.02"/>
        <geom name="cylg" type="cylinder" pos="0.12 0 0.05"
              size="0.025 0.08" euler="90 0 0" mass="0.02" contype="0"
              conaffinity="0"/>
        <site name="cside" pos="0.12 0 0.09"/>
      </body>
    </body>
  </worldbody>
  <tendon>
    <spatial name="string" stiffness="15" damping="0.5" springlength="0.45">
      <site site="anchor"/>
      <geom geom="pulleyg" sidesite="pside"/>
      <site site="tip"/>
    </spatial>
    <spatial name="cyl_string" stiffness="8" damping="0.2"
             springlength="0.3">
      <site site="anchor"/>
      <geom geom="cylg" sidesite="cside"/>
      <site site="tip"/>
    </spatial>
  </tendon>
  <actuator>
    <motor name="pull" tendon="string" gear="1.5" ctrlrange="-1 1"/>
    <motor name="drive" joint="shoulder" gear="1" ctrlrange="-1 1"/>
  </actuator>
</mujoco>
"""


def test_tendon_wrap_length_moment_golden():
    """Sphere/cylinder tendon wrapping (VERDICT r3 next #3): tendon length
    and moment rows vs MuJoCo's mju_wrap over random configurations, at
    machine precision."""
    ref = mujoco.MjModel.from_xml_string(WRAP_ARM_XML)
    dref = mujoco.MjData(ref)
    m = load_model_from_xml(WRAP_ARM_XML)
    from oxide_control_tpu.physics import smooth
    from oxide_control_tpu.state import make_data

    d0 = make_data(m)

    @jax.jit
    def ours(q):
        dd = d0.replace(qpos=q)
        dd = smooth.kinematics(m, dd)
        dd = smooth.com_pos(m, dd)
        return smooth.tendon_length_moment(m, dd)

    def dense_tenJ():
        out = np.zeros((ref.ntendon, ref.nv))
        for t in range(ref.ntendon):
            nnz, adr = ref.ten_J_rownnz[t], ref.ten_J_rowadr[t]
            for i in range(nnz):
                out[t, ref.ten_J_colind[adr + i]] = dref.ten_J[adr + i]
        return out

    rng = np.random.default_rng(3)
    worst_l = worst_j = 0.0
    for _ in range(60):
        q = rng.uniform(-1.5, 1.0, ref.nq)
        dref.qpos[:] = q
        mujoco.mj_forward(ref, dref)
        L, J = ours(jnp.asarray(q))
        worst_l = max(worst_l, float(np.max(np.abs(
            np.asarray(L) - dref.ten_length))))
        worst_j = max(worst_j, float(np.max(np.abs(
            np.asarray(J) - dense_tenJ()))))
    assert worst_l < 1e-10, worst_l
    assert worst_j < 1e-10, worst_j


def test_tendon_wrap_trajectory_golden():
    """Wrapped-tendon arm trajectory (sphere + cylinder wraps with
    sidesites, tendon springs/dampers + tendon actuator) vs MuJoCo."""
    compare(WRAP_ARM_XML, 300, seed=29, tol=1e-7)


def test_tendon_wrap_muscle_golden():
    """Combined muscle + wrap (VERDICT r3 next #3 'done' criterion): a
    muscle actuator pulling through a wrapped spatial tendon, explicit
    lengthrange (MuJoCo's simulation-based lengthrange estimation is out
    of scope), vs MuJoCo trajectories."""
    xml = WRAP_ARM_XML.replace(
        '<motor name="pull" tendon="string" gear="1.5" ctrlrange="-1 1"/>',
        '<muscle name="pull" tendon="string" lengthrange="0.3 0.8" '
        'force="80"/>',
    )
    compare(xml, 300, seed=31, tol=1e-7)


def test_fluid_forces_golden():
    """mj_fluid inertia-box model (VERDICT r2 item 6): a 3-link planar
    swimmer in a viscous+dense medium with wind — density drag, viscous
    drag, and wind all active, vs MuJoCo trajectories."""
    xml = """
    <mujoco>
      <option timestep="0.002" density="1000" viscosity="0.5"
              wind="0.1 -0.05 0" gravity="0 0 0"
              solver="Newton" iterations="10" tolerance="0"/>
      <worldbody>
        <body name="head" pos="0 0 0.5">
          <joint name="rx" type="slide" axis="1 0 0" damping="0"/>
          <joint name="ry" type="slide" axis="0 1 0" damping="0"/>
          <joint name="rz" type="hinge" axis="0 0 1" damping="0"/>
          <geom type="capsule" fromto="0 0 0 0.15 0 0" size="0.03" mass="0.2"/>
          <body pos="0.15 0 0">
            <joint name="j1" type="hinge" axis="0 0 1" damping="0.01"/>
            <geom type="capsule" fromto="0 0 0 0.15 0 0" size="0.025" mass="0.15"/>
            <body pos="0.15 0 0">
              <joint name="j2" type="hinge" axis="0 0 1" damping="0.01"/>
              <geom type="capsule" fromto="0 0 0 0.15 0 0" size="0.02" mass="0.1"/>
            </body>
          </body>
        </body>
      </worldbody>
      <actuator>
        <motor joint="j1" gear="0.3" ctrlrange="-1 1"/>
        <motor joint="j2" gear="0.2" ctrlrange="-1 1"/>
      </actuator>
    </mujoco>
    """
    compare(xml, 500, seed=31, tol=1e-7)


def test_fluid_free_body_golden():
    """Tumbling free box in a dense medium: rotational quadratic drag in
    the inertial frame + wind, vs MuJoCo."""
    xml = """
    <mujoco>
      <option timestep="0.002" density="500" viscosity="1.2"
              wind="0.3 0.2 -0.1" gravity="0 0 -1"/>
      <worldbody>
        <body pos="0 0 2" euler="20 35 10">
          <freejoint/>
          <geom type="box" size="0.1 0.2 0.05" mass="0.8"/>
        </body>
      </worldbody>
    </mujoco>
    """
    ref = mujoco.MjModel.from_xml_string(xml)
    qpos = ref.qpos0.copy()
    qvel = np.array([0.5, -0.3, 0.2, 2.0, -1.5, 3.0])
    compare(xml, 500, seed=33, tol=1e-7, init=(qpos, qvel))


def test_cylinder_actuator_golden():
    """<cylinder> actuator shortcut (VERDICT r3 missing #4): filter
    dynamics + piston-area gain + affine bias, field-for-field vs MuJoCo
    and on trajectories."""
    xml = """
    <mujoco>
      <option timestep="0.002" solver="Newton" iterations="20" tolerance="0"/>
      <worldbody>
        <body pos="0 0 1">
          <joint name="h1" type="hinge" axis="0 1 0" damping="0.1"/>
          <geom type="capsule" fromto="0 0 0 0.3 0 0" size="0.03" mass="1"/>
        </body>
      </worldbody>
      <actuator>
        <cylinder joint="h1" timeconst="0.15" diameter="0.04" bias="2 0 0"/>
      </actuator>
    </mujoco>
    """
    ref = mujoco.MjModel.from_xml_string(xml)
    m = load_model_from_xml(xml)
    for f in ("actuator_gainprm", "actuator_biasprm", "actuator_dynprm"):
        np.testing.assert_allclose(
            np.asarray(getattr(m, f), dtype=float),
            getattr(ref, f), atol=1e-12, err_msg=f,
        )
    assert tuple(m.actuator_dyntype) == tuple(ref.actuator_dyntype)
    assert m.na == 1
    compare(xml, 400, seed=37, tol=1e-8)


def test_tendon_equality_golden():
    """Tendon equality constraints (VERDICT r3 missing #3): fixed-tendon
    polynomial coupling rows vs MuJoCo trajectories."""
    xml = """
    <mujoco>
      <option timestep="0.002" solver="Newton" iterations="20" tolerance="0"/>
      <worldbody>
        <geom name="floor" type="plane" size="5 5 .1"/>
        <body pos="0 0 0.6">
          <joint name="h1" type="hinge" axis="0 1 0" damping="0.1"/>
          <geom type="capsule" fromto="0 0 0 0.3 0 0" size="0.04" mass="1"/>
          <body pos="0.3 0 0">
            <joint name="h2" type="hinge" axis="0 1 0" damping="0.1"/>
            <geom type="sphere" size="0.05" mass="0.4"/>
          </body>
        </body>
        <body pos="0.8 0 0.6">
          <joint name="h3" type="hinge" axis="0 1 0" damping="0.05"/>
          <geom type="capsule" fromto="0 0 0 0.2 0 0" size="0.03" mass="0.5"/>
        </body>
      </worldbody>
      <tendon>
        <fixed name="tA">
          <joint joint="h1" coef="0.7"/><joint joint="h2" coef="-0.4"/>
        </fixed>
        <fixed name="tB"><joint joint="h3" coef="1.0"/></fixed>
      </tendon>
      <equality>
        <tendon tendon1="tA" tendon2="tB" polycoef="0 0.8 0.2 0 0"/>
      </equality>
      <actuator><motor joint="h1" gear="1"/></actuator>
    </mujoco>
    """
    ref = mujoco.MjModel.from_xml_string(xml)
    m = load_model_from_xml(xml)
    assert m.neq == 1
    np.testing.assert_allclose(
        np.asarray(m.tendon_length0), ref.tendon_length0, atol=1e-12
    )
    compare(xml, 400, seed=41, tol=1e-7)


def test_tendon_equality_spatial_golden():
    """Tendon equality on a SPATIAL tendon (state-dependent moment rows)
    vs MuJoCo."""
    xml = """
    <mujoco>
      <option timestep="0.002" solver="Newton" iterations="20" tolerance="0"/>
      <worldbody>
        <site name="anchor" pos="0 0 1.2"/>
        <body pos="0 0 1">
          <joint name="sh" type="hinge" axis="0 1 0" damping="0.1"/>
          <geom type="capsule" fromto="0 0 0 0.3 0 0" size="0.03" mass="1"/>
          <site name="tip" pos="0.3 0 0"/>
        </body>
        <body pos="0.6 0 1">
          <joint name="h3" type="hinge" axis="0 1 0" damping="0.05"/>
          <geom type="capsule" fromto="0 0 0 0.2 0 0" size="0.03" mass="0.5"/>
        </body>
      </worldbody>
      <tendon>
        <spatial name="sp"><site site="anchor"/><site site="tip"/></spatial>
        <fixed name="fx"><joint joint="h3" coef="1.0"/></fixed>
      </tendon>
      <equality><tendon tendon1="sp" tendon2="fx"/></equality>
      <actuator><motor joint="sh" gear="1"/></actuator>
    </mujoco>
    """
    compare(xml, 300, seed=43, tol=1e-7)


REFSITE_XML = """
<mujoco>
  <option timestep="0.002" solver="Newton" iterations="20" tolerance="0"/>
  <worldbody>
    <body pos="0 0 1">
      <joint name="h1" type="hinge" axis="0 1 0" damping="0.2"/>
      <geom type="capsule" fromto="0 0 0 0.3 0 0" size="0.03" mass="1"/>
      <site name="ref" pos="0.1 0 0.05" euler="10 20 5"/>
      <body pos="0.3 0 0">
        <joint name="h2" type="hinge" axis="1 0 0" damping="0.2"/>
        <joint name="h3" type="slide" axis="0 0 1" damping="0.5"/>
        <geom type="sphere" size="0.05" mass="0.4"/>
        <site name="tip" pos="0.05 0.02 0" euler="0 30 0"/>
      </body>
    </body>
  </worldbody>
  <actuator>
    <general site="tip" refsite="ref" gear="1 0.5 -0.3 0.2 -0.1 0.4"
             gainprm="3"/>
  </actuator>
</mujoco>
"""


def test_refsite_transmission_golden():
    """Site transmission WITH refsite (VERDICT r3 missing #4): moment rows
    exact vs MuJoCo; translational length exact; trajectories match (the
    applied force is gain*ctrl through the exact moment).

    Known deviation (documented in tests/ORACLE.md): MuJoCo's ROTATIONAL
    refsite length is inconsistent with its own moment (finite-differencing
    mj's actuator_length gives ~half its reported moment); we use the
    subQuat length whose gradient IS the exact moment."""
    from oxide_control_tpu.physics import smooth
    from oxide_control_tpu.state import make_data

    ref = mujoco.MjModel.from_xml_string(REFSITE_XML)
    dref = mujoco.MjData(ref)
    m = load_model_from_xml(REFSITE_XML)
    d0 = make_data(m)
    rng = np.random.default_rng(5)
    worst = 0.0
    for _ in range(40):
        q = rng.uniform(-1.0, 1.0, ref.nq)
        dref.qpos[:] = q
        mujoco.mj_forward(ref, dref)
        dd = d0.replace(qpos=jnp.asarray(q))
        dd = smooth.kinematics(m, dd)
        dd = smooth.com_pos(m, dd)
        mom, _ = smooth.actuator_moments(m, dd)
        momref = np.zeros((ref.nu, ref.nv))
        mujoco.mju_sparse2dense(
            momref, dref.actuator_moment.ravel(), dref.moment_rownnz,
            dref.moment_rowadr, dref.moment_colind,
        )
        worst = max(worst, float(np.max(np.abs(np.asarray(mom) - momref))))
    assert worst < 1e-12, worst
    compare(REFSITE_XML, 400, seed=47, tol=1e-7)


def test_adhesion_actuator_golden():
    """<adhesion> actuator (VERDICT r3 missing #4): force along averaged
    active-contact normals (margin-gated), vs MuJoCo trajectories — a pad
    that grips a free ball against gravity when ctrl is high."""
    xml = """
    <mujoco>
      <option timestep="0.002" solver="Newton" iterations="30"
              tolerance="0"/>
      <worldbody>
        <geom name="floor" type="plane" size="5 5 .1"/>
        <body name="ball" pos="0 0 0.1">
          <joint type="free"/>
          <geom name="bg" type="sphere" size="0.1" mass="0.3"
                margin="0.03"/>
        </body>
        <body name="pad" pos="0 0 0.32">
          <joint name="lift" type="slide" axis="0 0 1" damping="2"/>
          <geom name="pg" type="box" size="0.15 0.15 0.1" mass="1"
                margin="0.03"/>
        </body>
      </worldbody>
      <actuator>
        <adhesion body="pad" gain="30" ctrlrange="0 1"/>
        <motor joint="lift" gear="10" ctrlrange="-1 1"/>
      </actuator>
    </mujoco>
    """
    ref = mujoco.MjModel.from_xml_string(xml)
    m = load_model_from_xml(xml)
    from oxide_control_tpu.model import TrnType

    assert TrnType(m.actuator_trntype[0]) == TrnType.BODY
    np.testing.assert_allclose(
        np.asarray(m.actuator_gainprm)[0], ref.actuator_gainprm[0],
        atol=1e-12,
    )
    # hold-the-ball ctrl: adhesion on, lift up -> ball must come along in
    # both engines; then release
    nsteps = 400
    ctrls = np.zeros((nsteps, 2))
    ctrls[:, 0] = 1.0
    ctrls[150:, 1] = 0.5
    ctrls[300:, 0] = 0.0
    qp_ref, qv_ref = rollout_mujoco(xml, ref.qpos0.copy(),
                                    np.zeros(ref.nv), ctrls)
    qp, qv = rollout_ours(xml, ref.qpos0.copy(), np.zeros(ref.nv), ctrls)
    err_q = np.max(np.abs(qp - qp_ref))
    assert err_q < 1e-5, err_q
    # the grip actually lifted the ball off the floor in the oracle
    assert qp_ref[280, 2] > 0.12

BALL_FREE_ACTUATOR = """
<mujoco>
  <option timestep="0.002"/>
  <worldbody>
    <body pos="0 0 1">
      <joint name="b" type="ball" damping="0.05"/>
      <geom type="capsule" fromto="0 0 0 0.3 0 0" size="0.03" mass="0.5"/>
    </body>
    <body pos="1 0 1">
      <joint name="f" type="free"/>
      <geom type="box" size="0.1 0.08 0.06" mass="1" pos="0.02 0 0"/>
    </body>
  </worldbody>
  <actuator>
    <motor joint="b" gear="1 0.5 0.2"/>
    <general joint="b" gear="0.3 1 0" biastype="affine" biasprm="0 -2 -0.1"/>
    <motor joint="f" gear="0 0 4 0 0 0.5"/>
    <motor joint="f" gear="1 0 0 0.3 0 0"/>
  </actuator>
</mujoco>
"""


def test_ball_free_actuator_golden():
    """Motors on ball and free joints (mj_transmission mjTRN_JOINT on
    quaternion joints: moment = gear scattered on the dofs, ball length =
    expmap . gear[:3]) vs CPU MuJoCo (reference hot call physics.rs:44-46)."""
    ref = mujoco.MjModel.from_xml_string(BALL_FREE_ACTUATOR)
    rng = np.random.default_rng(3)
    qvel = rng.uniform(-0.3, 0.3, ref.nv)
    ctrls = rng.uniform(-1, 1, (60, ref.nu))
    mq, mv = rollout_mujoco(BALL_FREE_ACTUATOR, ref.qpos0, qvel, ctrls)
    oq, ov = rollout_ours(BALL_FREE_ACTUATOR, ref.qpos0, qvel, ctrls)
    assert np.abs(mq - oq).max() < 1e-10
    assert np.abs(mv - ov).max() < 1e-9


def test_free_joint_spring_golden():
    """Free-joint springs (translation spring to qpos_spring[:3] +
    quaternion spring via mju_subQuat on the rotation dofs, mj_passive)
    vs CPU MuJoCo, displaced + rotated initial state."""
    xml = """
    <mujoco>
      <option timestep="0.002" gravity="0 0 -1"/>
      <worldbody>
        <body pos="0 0 1">
          <joint type="free" stiffness="8" damping="0.2"/>
          <geom type="box" size="0.1 0.08 0.06" mass="1" pos="0.02 0.01 0"/>
        </body>
      </worldbody>
    </mujoco>
    """
    ref = mujoco.MjModel.from_xml_string(xml)
    qpos = ref.qpos0.copy()
    qpos[:3] += [0.1, -0.05, 0.2]
    q = np.array([0.9, 0.1, 0.3, -0.2])
    qpos[3:7] = q / np.linalg.norm(q)
    rng = np.random.default_rng(5)
    qvel = rng.uniform(-0.3, 0.3, ref.nv)
    ctrls = np.zeros((80, 0))
    mq, mv = rollout_mujoco(xml, qpos, qvel, ctrls)
    oq, ov = rollout_ours(xml, qpos, qvel, ctrls)
    assert np.abs(mq - oq).max() < 1e-10
    assert np.abs(mv - ov).max() < 1e-9


def test_replicate_golden():
    """<replicate> meta-expansion produces a dynamically identical model:
    three replicated actuated pendulums vs CPU MuJoCo (mj_loadXML macro
    layer behind physics.rs:12-24)."""
    xml = fixtures.REPLICATE
    ref = mujoco.MjModel.from_xml_string(xml)
    rng = np.random.default_rng(11)
    qvel = rng.uniform(-0.5, 0.5, ref.nv)
    ctrls = rng.uniform(-1, 1, (80, ref.nu))
    mq, mv = rollout_mujoco(xml, ref.qpos0, qvel, ctrls)
    oq, ov = rollout_ours(xml, ref.qpos0, qvel, ctrls)
    assert np.abs(mq - oq).max() < 1e-10
    assert np.abs(mv - ov).max() < 1e-9


def test_cable_golden():
    """<composite type="cable"> swinging chain (free-rooted polyline with
    ball joints, per-joint spring/damper, consecutive-body excludes) vs
    CPU MuJoCo over 150 steps."""
    xml = fixtures.CABLE
    ref = mujoco.MjModel.from_xml_string(xml)
    rng = np.random.default_rng(13)
    qvel = rng.uniform(-0.5, 0.5, ref.nv)
    ctrls = np.zeros((150, 0))
    mq, mv = rollout_mujoco(xml, ref.qpos0, qvel, ctrls)
    oq, ov = rollout_ours(xml, ref.qpos0, qvel, ctrls)
    assert np.abs(mq - oq).max() < 1e-9
    assert np.abs(mv - ov).max() < 1e-8


def test_cable_hang_golden():
    """Curve-generated ball-anchored hanging cable settles identically to
    the oracle (gravity + joint dampers, 200 steps)."""
    xml = fixtures.CABLE_HANG
    ref = mujoco.MjModel.from_xml_string(xml)
    qvel = np.zeros(ref.nv)
    ctrls = np.zeros((200, 0))
    mq, mv = rollout_mujoco(xml, ref.qpos0, qvel, ctrls)
    oq, ov = rollout_ours(xml, ref.qpos0, qvel, ctrls)
    assert np.abs(mq - oq).max() < 1e-9
    assert np.abs(mv - ov).max() < 1e-8
