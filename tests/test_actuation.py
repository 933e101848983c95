"""Stateful actuator dynamics (dyntype integrator/filter/filterexact) and
actuator shorthands (intvelocity, damper): golden trajectories vs CPU MuJoCo.

Reference contract: act/set_act accessors (physics.rs:96-102) are only
meaningful when the engine actually integrates activation states as part of
mj_step (SURVEY.md §2.2 actuation stage).
"""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np

from test_golden import compare

import fixtures
from oxide_control_tpu import load_model_from_xml


def _with_actuator(base_xml, actuator_xml):
    start = base_xml.index("<actuator>")
    end = base_xml.index("</actuator>") + len("</actuator>")
    return base_xml[:start] + actuator_xml + base_xml[end:]


def test_filter_actuator_golden():
    xml = _with_actuator(fixtures.PENDULUM, """
  <actuator>
    <general name="filt" joint="hinge" gainprm="1.5" dyntype="filter"
             dynprm="0.05" ctrlrange="-1 1" ctrllimited="true"/>
  </actuator>""")
    compare(xml, 500, 21, 1e-8)


def test_filterexact_actuator_golden():
    xml = _with_actuator(fixtures.PENDULUM, """
  <actuator>
    <general name="filt" joint="hinge" gainprm="1.5" dyntype="filterexact"
             dynprm="0.05" ctrlrange="-1 1" ctrllimited="true"/>
  </actuator>""")
    compare(xml, 500, 22, 1e-8)


def test_integrator_actuator_golden():
    xml = _with_actuator(fixtures.PENDULUM, """
  <actuator>
    <general name="integ" joint="hinge" gainprm="0.8" dyntype="integrator"
             actlimited="true" actrange="-1.5 1.5" ctrlrange="-1 1"
             ctrllimited="true"/>
  </actuator>""")
    compare(xml, 500, 23, 1e-8)


def test_intvelocity_actuator_golden():
    xml = _with_actuator(fixtures.CARTPOLE, """
  <actuator>
    <intvelocity name="iv" joint="slider" kp="10"
                 actrange="-1.5 1.5" ctrlrange="-1 1" ctrllimited="true"/>
  </actuator>""")
    compare(xml, 500, 24, 1e-8)


def test_damper_actuator_golden():
    xml = _with_actuator(fixtures.PENDULUM, """
  <actuator>
    <motor name="torque" joint="hinge" gear="1.5" ctrlrange="-1 1"/>
    <damper name="damp" joint="hinge" kv="2.0" ctrlrange="0 1"/>
  </actuator>""")
    # damper ctrl must be non-negative: shift the random ctrl into [0, 1]
    # by comparing with ctrl_scale applied to both actuators; MuJoCo clamps
    # ctrl to ctrlrange in fwdActuation, and so do we.
    compare(xml, 500, 25, 1e-8)


def test_filter_rk4_golden():
    xml = _with_actuator(fixtures.PENDULUM, """
  <actuator>
    <general name="filt" joint="hinge" gainprm="1.5" dyntype="filterexact"
             dynprm="0.05" ctrlrange="-1 1" ctrllimited="true"/>
  </actuator>""").replace('<option timestep="0.002"',
                          '<option integrator="RK4" timestep="0.002"')
    compare(xml, 500, 26, 1e-8)


def test_act_matches_mujoco_fieldwise():
    """act itself (not just qpos/qvel) matches CPU MuJoCo step-for-step."""
    import jax
    import jax.numpy as jnp

    from oxide_control_tpu import load_model_from_xml
    from oxide_control_tpu.physics import forward as fwd
    from oxide_control_tpu.state import make_data

    xml = _with_actuator(fixtures.PENDULUM, """
  <actuator>
    <general name="filt" joint="hinge" gainprm="1.5" dyntype="filter"
             dynprm="0.03" ctrlrange="-1 1" ctrllimited="true"/>
  </actuator>""")
    ref = mujoco.MjModel.from_xml_string(xml)
    rd = mujoco.MjData(ref)
    m = load_model_from_xml(xml)
    assert m.na == 1
    d = make_data(m)
    rng = np.random.default_rng(27)
    for i in range(100):
        c = rng.uniform(-1, 1, ref.nu)
        rd.ctrl[:] = c
        mujoco.mj_step(ref, rd)
        d = d.replace(ctrl=jnp.asarray(c))
        d = fwd.step(m, d)
        np.testing.assert_allclose(np.asarray(d.act), rd.act, atol=1e-12,
                                   err_msg=f"step {i}")


MUSCLE_XML = """
<mujoco>
  <option timestep="0.002" solver="Newton" iterations="10" tolerance="0"/>
  <worldbody>
    <body pos="0 0 1">
      <joint name="j1" type="hinge" axis="0 1 0" range="-60 40"
             limited="true" damping="0.1"/>
      <geom type="capsule" fromto="0 0 0 0.3 0 0" size="0.03" mass="1"/>
      <body pos="0.3 0 0">
        <joint name="j2" type="hinge" axis="0 1 0" range="0 120"
               limited="true" damping="0.05"/>
        <geom type="capsule" fromto="0 0 0 0.25 0 0" size="0.025" mass="0.5"/>
      </body>
    </body>
  </worldbody>
  <actuator>
    <muscle name="m1" joint="j1" gear="2" lengthrange="-2.0944 1.3963"/>
    <muscle name="m2" joint="j2" force="150" lengthrange="0 2.0944"
            timeconst="0.02 0.06" lmin="0.4" lmax="1.7" vmax="2"
            fpmax="1.1" fvmax="1.4" tausmooth="0.1"/>
  </actuator>
</mujoco>
"""


def test_muscle_actuators_golden():
    """Muscle FLV actuators (VERDICT r2 item 6): activation dynamics with
    activation-dependent time constants (incl. the tausmooth sigmoid
    blend), force-length-velocity gain, passive bias, and force auto-
    scaling via acc0 — full trajectories vs MuJoCo.  Explicit lengthrange
    keeps the normalization oracle-exact (our compiler derives it from the
    joint range; MuJoCo runs a simulation-based estimate)."""
    import mujoco as mj

    ref = mj.MjModel.from_xml_string(MUSCLE_XML)
    m = load_model_from_xml(MUSCLE_XML)
    np.testing.assert_allclose(
        np.asarray(m.actuator_acc0), ref.actuator_acc0, rtol=1e-9
    )
    rd = mj.MjData(ref)
    rng = np.random.default_rng(41)
    nsteps = 500
    holds = rng.uniform(0.0, 1.0, (nsteps // 25 + 1, ref.nu))
    ctrls = np.repeat(holds, 25, axis=0)[:nsteps]

    qp_ref, act_ref = [], []
    for c in ctrls:
        rd.ctrl[:] = c
        mj.mj_step(ref, rd)
        qp_ref.append(rd.qpos.copy())
        act_ref.append(rd.act.copy())

    from oxide_control_tpu.physics import forward as fwd
    from oxide_control_tpu.state import make_data

    d = make_data(m)

    def body(d, ctrl):
        d = d.replace(ctrl=ctrl)
        d = fwd.step(m, d)
        return d, (d.qpos, d.act)

    _, (qp, act) = jax.lax.scan(body, d, jnp.asarray(ctrls))
    err_q = np.max(np.abs(np.asarray(qp) - np.array(qp_ref)))
    err_a = np.max(np.abs(np.asarray(act) - np.array(act_ref)))
    assert err_q < 1e-8, err_q
    assert err_a < 1e-8, err_a


def test_muscle_derived_lengthrange():
    """Without an explicit lengthrange the compiler derives it from the
    limited joint range; MuJoCo's simulated estimate differs by ~1e-3, so
    the trajectories track at a looser tolerance."""
    xml = MUSCLE_XML.replace(' lengthrange="-2.0944 1.3963"', "").replace(
        ' lengthrange="0 2.0944"', "")
    import mujoco as mj

    ref = mj.MjModel.from_xml_string(xml)
    m = load_model_from_xml(xml)
    np.testing.assert_allclose(
        np.asarray(m.actuator_lengthrange), ref.actuator_lengthrange,
        atol=5e-3,
    )
