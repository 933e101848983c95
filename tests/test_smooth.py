"""Golden per-stage tests: each smooth-dynamics stage vs the matching
mjData field (SURVEY.md §4 item 1/2)."""

import mujoco
import numpy as np
import pytest

import fixtures
from oxide_control_tpu import load_model_from_xml
from oxide_control_tpu.model import JointType
from oxide_control_tpu.physics import forward as fwd
from oxide_control_tpu.state import make_data

MODELS = {
    "pendulum": fixtures.PENDULUM,
    "cartpole": fixtures.CARTPOLE,
    "ball_joint": fixtures.BALL_JOINT,
    "free_body": fixtures.FREE_BODY,
    "planar_walker": fixtures.PLANAR_WALKER,
}


def random_state(ref, rng, scale=0.3):
    """Random valid (qpos, qvel, ctrl) near qpos0."""
    qpos = ref.qpos0.copy()
    for j in range(ref.njnt):
        adr = ref.jnt_qposadr[j]
        t = ref.jnt_type[j]
        if t == mujoco.mjtJoint.mjJNT_HINGE or t == mujoco.mjtJoint.mjJNT_SLIDE:
            qpos[adr] += rng.uniform(-scale, scale)
        elif t == mujoco.mjtJoint.mjJNT_BALL:
            q = rng.normal(size=4)
            q[0] += 3.0  # small rotation
            qpos[adr : adr + 4] = q / np.linalg.norm(q)
        else:  # free
            qpos[adr : adr + 3] += rng.uniform(-scale, scale, 3)
            q = rng.normal(size=4)
            q[0] += 3.0
            qpos[adr + 3 : adr + 7] = q / np.linalg.norm(q)
    qvel = rng.uniform(-1.0, 1.0, ref.nv)
    ctrl = rng.uniform(-1.0, 1.0, ref.nu)
    return qpos, qvel, ctrl


def setup(name, seed=0):
    xml = MODELS[name]
    ref = mujoco.MjModel.from_xml_string(xml)
    rd = mujoco.MjData(ref)
    rng = np.random.default_rng(seed)
    qpos, qvel, ctrl = random_state(ref, rng)
    rd.qpos[:] = qpos
    rd.qvel[:] = qvel
    rd.ctrl[:] = ctrl
    mujoco.mj_forward(ref, rd)

    m = load_model_from_xml(xml)
    d = make_data(m)
    d = d.replace(
        qpos=qpos.copy(), qvel=qvel.copy(), ctrl=ctrl.copy()
    )
    d = fwd.forward(m, d)
    return m, d, ref, rd


@pytest.fixture(params=list(MODELS), ids=list(MODELS))
def quad(request):
    return setup(request.param)


def test_invweight0(quad):
    m, d, ref, rd = quad
    np.testing.assert_allclose(m.dof_invweight0, ref.dof_invweight0, atol=1e-9)
    np.testing.assert_allclose(
        m.body_invweight0, ref.body_invweight0, atol=1e-9
    )


def test_kinematics(quad):
    m, d, ref, rd = quad
    np.testing.assert_allclose(d.xpos, rd.xpos, atol=1e-10)
    for i in range(m.nbody):
        assert abs(np.dot(np.asarray(d.xquat)[i], rd.xquat[i])) > 1 - 1e-10
    np.testing.assert_allclose(d.xipos, rd.xipos, atol=1e-10)
    # ximat can differ from MuJoCo's by principal-axis permutation/sign when
    # inertia eigenvalues are degenerate (capsules): compare the world-frame
    # inertia tensor instead, which is what dynamics depends on.
    ours = np.einsum(
        "bij,bj,bkj->bik", np.asarray(d.ximat), np.asarray(m.body_inertia), np.asarray(d.ximat)
    )
    theirs = np.einsum(
        "bij,bj,bkj->bik",
        rd.ximat.reshape(-1, 3, 3),
        ref.body_inertia,
        rd.ximat.reshape(-1, 3, 3),
    )
    np.testing.assert_allclose(ours, theirs, atol=1e-9)
    np.testing.assert_allclose(d.xanchor, rd.xanchor, atol=1e-10)
    np.testing.assert_allclose(d.xaxis, rd.xaxis, atol=1e-10)
    np.testing.assert_allclose(d.geom_xpos, rd.geom_xpos, atol=1e-10)
    np.testing.assert_allclose(
        np.asarray(d.geom_xmat), rd.geom_xmat.reshape(-1, 3, 3), atol=1e-10
    )
    if m.nsite:
        np.testing.assert_allclose(d.site_xpos, rd.site_xpos, atol=1e-10)


def test_com_quantities(quad):
    m, d, ref, rd = quad
    np.testing.assert_allclose(d.subtree_com, rd.subtree_com, atol=1e-10)
    # cinert packing: [Ixx Iyy Izz Ixy Ixz Iyz hx hy hz m]
    c = rd.cinert
    ref_i = np.zeros((m.nbody, 3, 3))
    ref_i[:, 0, 0] = c[:, 0]
    ref_i[:, 1, 1] = c[:, 1]
    ref_i[:, 2, 2] = c[:, 2]
    ref_i[:, 0, 1] = ref_i[:, 1, 0] = c[:, 3]
    ref_i[:, 0, 2] = ref_i[:, 2, 0] = c[:, 4]
    ref_i[:, 1, 2] = ref_i[:, 2, 1] = c[:, 5]
    np.testing.assert_allclose(np.asarray(d.cinert_i), ref_i, atol=1e-9)
    np.testing.assert_allclose(np.asarray(d.cinert_h), c[:, 6:9], atol=1e-9)
    np.testing.assert_allclose(d.cdof, rd.cdof, atol=1e-10)


def test_qM(quad):
    m, d, ref, rd = quad
    full = np.zeros((ref.nv, ref.nv))
    mujoco.mj_fullM(ref, rd, full)
    np.testing.assert_allclose(np.asarray(d.qM), full, atol=1e-9)


def test_velocity_stage(quad):
    m, d, ref, rd = quad
    np.testing.assert_allclose(d.cvel, rd.cvel, atol=1e-10)
    np.testing.assert_allclose(d.cdof_dot, rd.cdof_dot, atol=1e-10)
    np.testing.assert_allclose(d.qfrc_bias, rd.qfrc_bias, atol=1e-9)
    np.testing.assert_allclose(d.qfrc_passive, rd.qfrc_passive, atol=1e-10)


def test_actuation(quad):
    m, d, ref, rd = quad
    if m.nu == 0:
        return
    np.testing.assert_allclose(d.actuator_length, rd.actuator_length, atol=1e-10)
    np.testing.assert_allclose(
        d.actuator_velocity, rd.actuator_velocity, atol=1e-10
    )
    np.testing.assert_allclose(d.actuator_force, rd.actuator_force, atol=1e-10)
    np.testing.assert_allclose(d.qfrc_actuator, rd.qfrc_actuator, atol=1e-10)


def test_smooth_acceleration(quad):
    m, d, ref, rd = quad
    np.testing.assert_allclose(d.qfrc_smooth, rd.qfrc_smooth, atol=1e-9)
    np.testing.assert_allclose(d.qacc_smooth, rd.qacc_smooth, atol=1e-8)


def test_xfrc_applied():
    """Cartesian wrench accumulation (reference accessor surface:
    xfrc_applied, physics.rs:140-145)."""
    xml = fixtures.PLANAR_WALKER
    ref = mujoco.MjModel.from_xml_string(xml)
    rd = mujoco.MjData(ref)
    rng = np.random.default_rng(3)
    qpos, qvel, ctrl = random_state(ref, rng)
    rd.qpos[:] = qpos
    rd.qvel[:] = qvel
    rd.xfrc_applied[:] = rng.normal(size=(ref.nbody, 6))
    mujoco.mj_forward(ref, rd)

    m = load_model_from_xml(xml)
    d = make_data(m)
    d = d.replace(
        qpos=qpos.copy(), qvel=qvel.copy(),
        xfrc_applied=rd.xfrc_applied.copy(),
    )
    d = fwd.forward(m, d)
    np.testing.assert_allclose(d.qfrc_smooth, rd.qfrc_smooth, atol=1e-9)
    np.testing.assert_allclose(d.qacc_smooth, rd.qacc_smooth, atol=1e-8)
