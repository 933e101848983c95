"""Stateful actuator dynamics (dyntype integrator/filter/filterexact) and
actuator shorthands (intvelocity, damper): golden trajectories vs CPU MuJoCo.

Reference contract: act/set_act accessors (physics.rs:96-102) are only
meaningful when the engine actually integrates activation states as part of
mj_step (SURVEY.md §2.2 actuation stage).
"""

import mujoco
import numpy as np

from test_golden import compare

import fixtures


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
