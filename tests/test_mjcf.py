"""MJCF compiler validation: field-by-field against mujoco.MjModel.

SURVEY.md §7 stage 1: "Validate against mujoco Python's compiled model
fields."
"""

import mujoco
import numpy as np
import pytest

import fixtures
from oxide_control_tpu import load_model_from_xml
from oxide_control_tpu.model import JointType
from oxide_control_tpu.physics import maths

ALL_MODELS = {
    "pendulum": fixtures.PENDULUM,
    "cartpole": fixtures.CARTPOLE,
    "planar_walker": fixtures.PLANAR_WALKER,
    "free_body": fixtures.FREE_BODY,
    "ball_joint": fixtures.BALL_JOINT,
    "euler_orient": fixtures.EULER_ORIENT,
    # meta-element expansions (r5: mj_loadXML macro layer)
    "replicate": fixtures.REPLICATE,
    "cable": fixtures.CABLE,
    "cable_hang": fixtures.CABLE_HANG,
}


@pytest.fixture(params=list(ALL_MODELS), ids=list(ALL_MODELS))
def pair(request):
    xml = ALL_MODELS[request.param]
    return load_model_from_xml(xml), mujoco.MjModel.from_xml_string(xml)


def inertia_full(diag, quat):
    r = np.asarray(maths.quat_to_mat(np.asarray(quat)))
    return np.einsum("nij,nj,nkj->nik", r, np.asarray(diag), r)


def test_sizes(pair):
    m, ref = pair
    assert m.nq == ref.nq
    assert m.nv == ref.nv
    assert m.nu == ref.nu
    assert m.nbody == ref.nbody
    assert m.njnt == ref.njnt
    assert m.ngeom == ref.ngeom
    assert m.nsite == ref.nsite
    assert m.nmocap == ref.nmocap


def test_options(pair):
    m, ref = pair
    assert m.opt.timestep == ref.opt.timestep
    np.testing.assert_allclose(m.opt.gravity, ref.opt.gravity)
    assert int(m.opt.integrator) == ref.opt.integrator
    assert int(m.opt.solver) == ref.opt.solver
    assert m.opt.iterations == ref.opt.iterations
    assert m.opt.tolerance == ref.opt.tolerance


def test_tree_structure(pair):
    m, ref = pair
    assert list(m.body_parentid) == list(ref.body_parentid)
    assert list(m.body_rootid) == list(ref.body_rootid)
    assert list(m.body_weldid) == list(ref.body_weldid)
    assert list(m.body_jntadr) == list(ref.body_jntadr)
    assert list(m.body_jntnum) == list(ref.body_jntnum)
    assert list(m.body_dofadr) == list(ref.body_dofadr)
    assert list(m.body_dofnum) == list(ref.body_dofnum)
    assert list(m.jnt_qposadr) == list(ref.jnt_qposadr)
    assert list(m.jnt_dofadr) == list(ref.jnt_dofadr)
    assert list(m.jnt_bodyid) == list(ref.jnt_bodyid)
    assert list(m.jnt_type) == list(ref.jnt_type)
    assert list(m.dof_bodyid) == list(ref.dof_bodyid)
    assert list(m.dof_jntid) == list(ref.dof_jntid)
    assert list(m.dof_parentid) == list(ref.dof_parentid)
    assert list(m.geom_bodyid) == list(ref.geom_bodyid)
    assert list(m.geom_type) == list(ref.geom_type)


def test_body_params(pair):
    m, ref = pair
    np.testing.assert_allclose(m.body_pos, ref.body_pos, atol=1e-12)
    # quaternions up to sign
    for i in range(m.nbody):
        assert abs(np.dot(m.body_quat[i], ref.body_quat[i])) > 1 - 1e-10
    np.testing.assert_allclose(m.body_mass, ref.body_mass, atol=1e-9)
    np.testing.assert_allclose(m.body_ipos, ref.body_ipos, atol=1e-9)
    ours = inertia_full(m.body_inertia, m.body_iquat)
    theirs = inertia_full(ref.body_inertia, ref.body_iquat)
    np.testing.assert_allclose(ours, theirs, atol=1e-9)
    np.testing.assert_allclose(
        sorted(np.asarray(m.body_inertia).ravel()),
        sorted(ref.body_inertia.ravel()),
        atol=1e-9,
    )
    np.testing.assert_allclose(m.body_subtreemass, ref.body_subtreemass, atol=1e-9)


def test_joint_params(pair):
    m, ref = pair
    np.testing.assert_allclose(m.jnt_pos, ref.jnt_pos, atol=1e-12)
    np.testing.assert_allclose(m.jnt_axis, ref.jnt_axis, atol=1e-12)
    np.testing.assert_allclose(m.jnt_range, ref.jnt_range, atol=1e-12)
    assert [int(x) for x in m.jnt_limited] == list(ref.jnt_limited)
    np.testing.assert_allclose(m.jnt_stiffness, ref.jnt_stiffness, atol=1e-12)
    np.testing.assert_allclose(m.dof_damping, ref.dof_damping, atol=1e-12)
    np.testing.assert_allclose(m.dof_armature, ref.dof_armature, atol=1e-12)
    np.testing.assert_allclose(m.qpos0, ref.qpos0, atol=1e-12)
    np.testing.assert_allclose(m.qpos_spring, ref.qpos_spring, atol=1e-12)
    np.testing.assert_allclose(m.jnt_solref, ref.jnt_solref, atol=1e-12)
    np.testing.assert_allclose(m.jnt_solimp, ref.jnt_solimp, atol=1e-12)


def test_geom_params(pair):
    m, ref = pair
    np.testing.assert_allclose(m.geom_pos, ref.geom_pos, atol=1e-12)
    for i in range(m.ngeom):
        assert abs(np.dot(m.geom_quat[i], ref.geom_quat[i])) > 1 - 1e-10
    np.testing.assert_allclose(m.geom_size, ref.geom_size, atol=1e-12)
    np.testing.assert_allclose(m.geom_friction, ref.geom_friction, atol=1e-12)
    np.testing.assert_allclose(m.geom_solref, ref.geom_solref, atol=1e-12)
    np.testing.assert_allclose(m.geom_solimp, ref.geom_solimp, atol=1e-12)
    np.testing.assert_allclose(m.geom_rbound, ref.geom_rbound, atol=1e-12)


def test_actuator_params(pair):
    m, ref = pair
    if m.nu == 0:
        return
    np.testing.assert_allclose(m.actuator_gear, ref.actuator_gear, atol=1e-12)
    np.testing.assert_allclose(m.actuator_ctrlrange, ref.actuator_ctrlrange, atol=1e-12)
    np.testing.assert_allclose(m.actuator_gainprm, ref.actuator_gainprm, atol=1e-12)
    np.testing.assert_allclose(m.actuator_biasprm, ref.actuator_biasprm, atol=1e-12)
    assert [int(x) for x in m.actuator_ctrllimited] == list(ref.actuator_ctrllimited)
    assert list(m.actuator_trnid) == list(ref.actuator_trnid[:, 0])
    assert list(m.actuator_gaintype) == list(ref.actuator_gaintype)
    assert list(m.actuator_biastype) == list(ref.actuator_biastype)


def test_names(pair):
    m, ref = pair
    for i in range(m.nbody):
        assert m.id2name("body", i) == (
            mujoco.mj_id2name(ref, mujoco.mjtObj.mjOBJ_BODY, i) or f"body{i}"
        ) or m.id2name("body", i) == mujoco.mj_id2name(ref, mujoco.mjtObj.mjOBJ_BODY, i)
    for i, name in enumerate(m.names.joint):
        refname = mujoco.mj_id2name(ref, mujoco.mjtObj.mjOBJ_JOINT, i)
        if refname:
            assert name == refname
            assert m.name2id("joint", name) == i


def test_pair_table_vs_mujoco_contacts(pair):
    """Our static pair table must cover every geom pair mujoco's broadphase
    can produce (checked structurally via mujoco's exclusion rules)."""
    m, ref = pair
    ours = {(int(a), int(b)) for a, b in zip(m.pair_geom1, m.pair_geom2)}
    # run mujoco forward at qpos0 and check its active contacts are subsets
    d = mujoco.MjData(ref)
    mujoco.mj_forward(ref, d)
    for i in range(d.ncon):
        g1, g2 = int(d.contact.geom1[i]), int(d.contact.geom2[i])
        key = (min(g1, g2), max(g1, g2))
        key_sorted = key if ref.geom_type[key[0]] <= ref.geom_type[key[1]] else (key[1], key[0])
        assert key_sorted in ours or (key_sorted[1], key_sorted[0]) in ours


def test_intvelocity_requires_actrange():
    """MuJoCo requires actrange on intvelocity (bounded setpoint) and
    act-limits it by default; we must reject at compile like the oracle."""
    from oxide_control_tpu.api.errors import ModelError
    from oxide_control_tpu import load_model_from_xml

    bad = """
    <mujoco>
      <worldbody>
        <body pos="0 0 1"><joint name="h" type="hinge"/>
          <geom type="sphere" size="0.05" mass="1"/></body>
      </worldbody>
      <actuator><intvelocity joint="h" kp="2"/></actuator>
    </mujoco>
    """
    with pytest.raises(ModelError):
        load_model_from_xml(bad)
    good = bad.replace('kp="2"', 'kp="2" actrange="-1 1"')
    m = load_model_from_xml(good)
    assert m.actuator_actlimited[0]
    assert m.na == 1


def test_damper_requires_nonneg_ctrlrange():
    """A damper with negative ctrl injects energy; MuJoCo refuses to compile
    without ctrlrange[0] >= 0 and so do we."""
    from oxide_control_tpu.api.errors import ModelError
    from oxide_control_tpu import load_model_from_xml

    tmpl = """
    <mujoco>
      <worldbody>
        <body pos="0 0 1"><joint name="h" type="hinge"/>
          <geom type="sphere" size="0.05" mass="1"/></body>
      </worldbody>
      <actuator><damper joint="h" kv="3" {attr}/></actuator>
    </mujoco>
    """
    with pytest.raises(ModelError):
        load_model_from_xml(tmpl.format(attr=""))
    with pytest.raises(ModelError):
        load_model_from_xml(tmpl.format(attr='ctrlrange="-1 1"'))
    m = load_model_from_xml(tmpl.format(attr='ctrlrange="0 1"'))
    assert m.actuator_ctrllimited[0]


def test_oracle_version():
    """The golden suite targets the 3.10 oracle semantics documented in
    tests/ORACLE.md; fail loudly if the environment swaps the wheel."""
    assert mujoco.__version__.startswith("3.10"), mujoco.__version__


def test_keyframe_parsing_and_reset():
    """<keyframe> keys compile into key_* fields matching MuJoCo, and
    reset_data_keyframe loads them (mj_resetDataKeyframe analog)."""
    import jax
    import jax.numpy as jnp

    from oxide_control_tpu.state import make_data, reset_data_keyframe

    xml = """
    <mujoco>
      <worldbody>
        <body pos="0 0 1">
          <joint name="h1" type="hinge" axis="0 1 0"/>
          <geom type="capsule" size="0.04" fromto="0 0 0 0.3 0 0" mass="1"/>
          <body pos="0.3 0 0">
            <joint name="h2" type="hinge" axis="0 1 0"/>
            <geom type="capsule" size="0.03" fromto="0 0 0 0.2 0 0" mass="0.5"/>
          </body>
        </body>
      </worldbody>
      <actuator><motor joint="h1"/></actuator>
      <keyframe>
        <key name="bent" qpos="0.4 -0.9" qvel="1 2" ctrl="0.5" time="3.5"/>
        <key name="rest"/>
      </keyframe>
    </mujoco>
    """
    m = load_model_from_xml(xml)
    ref = mujoco.MjModel.from_xml_string(xml)
    assert m.nkey == ref.nkey == 2
    np.testing.assert_allclose(np.asarray(m.key_qpos), ref.key_qpos)
    np.testing.assert_allclose(np.asarray(m.key_qvel), ref.key_qvel)
    np.testing.assert_allclose(np.asarray(m.key_ctrl), ref.key_ctrl)
    np.testing.assert_allclose(np.asarray(m.key_time), ref.key_time)
    assert m.name2id("keyframe", "bent") == 0

    d = make_data(m)
    d = reset_data_keyframe(m, d, "bent")
    np.testing.assert_allclose(np.asarray(d.qpos), [0.4, -0.9])
    np.testing.assert_allclose(np.asarray(d.qvel), [1.0, 2.0])
    np.testing.assert_allclose(np.asarray(d.ctrl), [0.5])
    assert float(d.time) == 3.5
    # "rest" key defaults: qpos0 / zeros
    d2 = reset_data_keyframe(m, d, 1)
    np.testing.assert_allclose(np.asarray(d2.qpos), np.asarray(m.qpos0))
    np.testing.assert_allclose(np.asarray(d2.qvel), [0.0, 0.0])

    # batched reset: every lane gets the keyframe
    bd = jax.vmap(lambda _: make_data(m))(jnp.arange(4))
    bd = reset_data_keyframe(m, bd, 0)
    assert np.asarray(bd.qpos).shape == (4, 2)
    np.testing.assert_allclose(np.asarray(bd.qpos)[2], [0.4, -0.9])


def test_mesh_obj_msh_loaders():
    """OBJ and legacy binary .msh mesh assets (VERDICT r3 missing #6)
    compile to the same mass/inertia as the oracle."""
    import os
    import struct
    import tempfile

    from oxide_control_tpu.mjcf.compile import load_model

    v = np.array([[x, y, z] for x in (-0.1, 0.1) for y in (-0.08, 0.08)
                  for z in (-0.05, 0.05)])
    faces = [(1, 2, 4, 3), (5, 7, 8, 6), (1, 5, 6, 2), (3, 4, 8, 7),
             (1, 3, 7, 5), (2, 6, 8, 4)]
    with tempfile.TemporaryDirectory() as td:
        with open(os.path.join(td, "blob.obj"), "w") as f:
            for p in v:
                f.write(f"v {p[0]} {p[1]} {p[2]}\n")
            for fa in faces:
                f.write("f " + " ".join(str(i) for i in fa) + "\n")
        with open(os.path.join(td, "blob.msh"), "wb") as f:
            f.write(struct.pack("<4i", len(v), 0, 0, 0))
            f.write(v.astype("<f4").tobytes())
        for ext in ("obj", "msh"):
            xml = f"""
            <mujoco>
              <asset><mesh name="blob" file="blob.{ext}"/></asset>
              <worldbody><body pos="0 0 1"><joint type="free"/>
                <geom type="mesh" mesh="blob" mass="1"/></body></worldbody>
            </mujoco>"""
            path = os.path.join(td, f"m_{ext}.xml")
            open(path, "w").write(xml)
            ref = mujoco.MjModel.from_xml_path(path)
            m = load_model(path)
            assert abs(float(np.asarray(m.body_mass)[1])
                       - ref.body_mass[1]) < 1e-10
            np.testing.assert_allclose(
                np.sort(np.asarray(m.body_inertia)[1]),
                np.sort(ref.body_inertia[1]), atol=1e-9,
            )
