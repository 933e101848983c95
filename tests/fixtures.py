"""Shared MJCF test fixtures used by compiler and golden-trajectory tests."""

PENDULUM = """
<mujoco model="pendulum">
  <option timestep="0.002" gravity="0 0 -9.81"/>
  <worldbody>
    <body name="pole" pos="0 0 1.2">
      <joint name="hinge" type="hinge" axis="0 1 0" damping="0.1"/>
      <geom name="rod" type="capsule" fromto="0 0 0 0 0 0.6" size="0.02" mass="1.2"/>
      <site name="tip" pos="0 0 0.6"/>
    </body>
  </worldbody>
  <actuator>
    <motor name="torque" joint="hinge" gear="1.5" ctrlrange="-1 1"/>
  </actuator>
</mujoco>
"""

CARTPOLE = """
<mujoco model="cartpole">
  <option timestep="0.002"/>
  <worldbody>
    <body name="cart" pos="0 0 1">
      <joint name="slider" type="slide" axis="1 0 0" range="-1.8 1.8" damping="0.05"/>
      <geom name="cart_geom" type="box" size="0.1 0.05 0.05" mass="1.0"/>
      <body name="pole" pos="0 0 0">
        <joint name="pole_hinge" type="hinge" axis="0 1 0" damping="0.01"/>
        <geom name="pole_geom" type="capsule" fromto="0 0 0 0 0 0.6" size="0.015" mass="0.3"/>
        <site name="pole_tip" pos="0 0 0.6"/>
      </body>
    </body>
  </worldbody>
  <actuator>
    <motor name="slide_motor" joint="slider" gear="5" ctrlrange="-1 1"/>
  </actuator>
</mujoco>
"""

# planar two-legged hopper-like model with contacts (capsules on a plane)
PLANAR_WALKER = """
<mujoco model="planar_walker">
  <option timestep="0.002" solver="CG" iterations="30" tolerance="0"/>
  <default>
    <joint damping="0.1" armature="0.01"/>
    <!-- dm_control idiom: body geoms collide with the floor but not with
         each other (contype 0 / conaffinity 1 vs floor contype 1) -->
    <geom friction="0.7 0.005 0.0001" solref="0.02 1" solimp="0.9 0.95 0.001 0.5 2"
          contype="0" conaffinity="1"/>
  </default>
  <worldbody>
    <geom name="floor" type="plane" size="10 10 0.1" contype="1" conaffinity="0"/>
    <body name="torso" pos="0 0 0.7">
      <joint name="rootx" type="slide" axis="1 0 0" damping="0" armature="0"/>
      <joint name="rootz" type="slide" axis="0 0 1" damping="0" armature="0"/>
      <joint name="rooty" type="hinge" axis="0 1 0" damping="0" armature="0"/>
      <geom name="torso_geom" type="capsule" fromto="0 0 -0.15 0 0 0.15" size="0.05" mass="3"/>
      <body name="thigh" pos="0 0 -0.15">
        <joint name="hip" type="hinge" axis="0 1 0" range="-1.0 1.0"/>
        <geom name="thigh_geom" type="capsule" fromto="0 0 0 0 0 -0.25" size="0.04" mass="1"/>
        <body name="shin" pos="0 0 -0.25">
          <joint name="knee" type="hinge" axis="0 1 0" range="-1.5 0.1"/>
          <geom name="shin_geom" type="capsule" fromto="0 0 0 0 0 -0.25" size="0.03" mass="0.6"/>
        </body>
      </body>
      <body name="thigh2" pos="0 0 -0.15">
        <joint name="hip2" type="hinge" axis="0 1 0" range="-1.0 1.0"/>
        <geom name="thigh2_geom" type="capsule" fromto="0 0 0 0 0.02 -0.25" size="0.04" mass="1"/>
        <body name="shin2" pos="0 0.02 -0.25">
          <joint name="knee2" type="hinge" axis="0 1 0" range="-1.5 0.1"/>
          <geom name="shin2_geom" type="capsule" fromto="0 0 0 0 0 -0.25" size="0.03" mass="0.6"/>
        </body>
      </body>
    </body>
  </worldbody>
  <actuator>
    <motor joint="hip" gear="30" ctrlrange="-1 1"/>
    <motor joint="knee" gear="30" ctrlrange="-1 1"/>
    <motor joint="hip2" gear="30" ctrlrange="-1 1"/>
    <motor joint="knee2" gear="30" ctrlrange="-1 1"/>
  </actuator>
</mujoco>
"""

FREE_BODY = """
<mujoco model="free_body">
  <option timestep="0.002" solver="CG" iterations="30" tolerance="0"/>
  <worldbody>
    <geom name="floor" type="plane" size="5 5 0.1"/>
    <body name="ball" pos="0.1 -0.2 0.5">
      <freejoint name="root"/>
      <geom name="sphere_geom" type="sphere" size="0.12" mass="0.8"/>
    </body>
  </worldbody>
</mujoco>
"""

BALL_JOINT = """
<mujoco model="ball_pendulum">
  <option timestep="0.002"/>
  <worldbody>
    <body name="arm" pos="0 0 1">
      <joint name="swivel" type="ball" damping="0.05"/>
      <geom name="arm_geom" type="capsule" fromto="0 0 0 0.05 0.1 -0.4" size="0.02" mass="0.5"/>
    </body>
  </worldbody>
</mujoco>
"""

EULER_ORIENT = """
<mujoco model="euler_orient">
  <compiler angle="degree"/>
  <worldbody>
    <body name="b1" pos="0.1 0.2 0.3" euler="30 20 10">
      <joint name="j1" type="hinge" axis="1 1 0" ref="15" springref="5" stiffness="2"/>
      <geom name="g1" type="box" size="0.1 0.2 0.15" pos="0.05 0 0" euler="0 45 0" mass="2"/>
      <geom name="g2" type="sphere" size="0.08" pos="-0.1 0.05 0.02" mass="0.5"/>
    </body>
  </worldbody>
</mujoco>
"""

# two-link pendulum welded to a free ball: exercises all 6 weld rows
WELD_PENDULUM = """
<mujoco model="weld_pendulum">
  <option timestep="0.002"/>
  <worldbody>
    <body name="a" pos="0 0 1">
      <joint name="j1" type="hinge" axis="0 1 0" damping="0.8"/>
      <geom type="capsule" fromto="0 0 0 0.3 0 0" size="0.02" mass="1"/>
      <body name="b" pos="0.3 0 0">
        <joint name="j2" type="hinge" axis="1 0 0" damping="0.8"/>
        <geom type="capsule" fromto="0 0 0 0 0.3 0" size="0.02" mass="1"/>
      </body>
    </body>
    <body name="c" pos="0.5 0.5 1">
      <joint name="j3" type="ball" damping="0.5"/>
      <geom type="capsule" fromto="0 0 0 0 0 -0.3" size="0.02" mass="1"/>
    </body>
  </worldbody>
  <equality>
    <weld body1="b" body2="c" anchor="0.05 0.02 -0.1"
          relpose="0.2 0.2 0 0.9238795 0 0.3826834 0" torquescale="0.7"/>
  </equality>
  <actuator>
    <motor joint="j1" gear="2" ctrlrange="-1 1"/>
  </actuator>
</mujoco>
"""

# weld with default relpose (all-zero quat -> qpos0 relative pose)
WELD_DEFAULT = """
<mujoco model="weld_default">
  <option timestep="0.002"/>
  <worldbody>
    <body name="a" pos="0 0 1">
      <joint name="j1" type="hinge" axis="0 1 0" damping="0.8"/>
      <geom type="capsule" fromto="0 0 0 0.3 0 0" size="0.02" mass="1"/>
    </body>
    <body name="c" pos="0.5 0.5 1.2" euler="0 30 0">
      <joint name="j3" type="ball" damping="0.5"/>
      <geom type="capsule" fromto="0 0 0 0 0 -0.3" size="0.02" mass="1"/>
    </body>
  </worldbody>
  <equality>
    <weld body1="a" body2="c"/>
  </equality>
  <actuator>
    <motor joint="j1" gear="2" ctrlrange="-1 1"/>
  </actuator>
</mujoco>
"""

# limited ball joint swinging under gravity into its limit
BALL_LIMIT = """
<mujoco model="ball_limit">
  <compiler angle="radian"/>
  <option timestep="0.002"/>
  <worldbody>
    <body name="arm" pos="0 0 1">
      <joint name="swivel" type="ball" range="0 0.5" limited="true" damping="0.02"/>
      <geom type="capsule" fromto="0 0 0 0.05 0.1 -0.4" size="0.02" mass="0.5"/>
    </body>
  </worldbody>
</mujoco>
"""

# spinning sphere with torsional friction (condim 4)
SPIN_SPHERE = """
<mujoco model="spin_sphere">
  <option timestep="0.002" solver="Newton" iterations="20" tolerance="0"/>
  <worldbody>
    <geom name="floor" type="plane" size="5 5 0.1"/>
    <body name="ball" pos="0 0 0.145">
      <freejoint/>
      <geom name="b" type="sphere" size="0.15" mass="1" condim="4"
            friction="0.8 0.3 0.0001"/>
    </body>
  </worldbody>
</mujoco>
"""

# rolling sphere with full condim 6 (torsional + rolling friction)
ROLL_SPHERE = """
<mujoco model="roll_sphere">
  <option timestep="0.002" solver="Newton" iterations="20" tolerance="0"/>
  <worldbody>
    <geom name="floor" type="plane" size="5 5 0.1"/>
    <body name="ball" pos="0 0 0.145">
      <freejoint/>
      <geom name="b" type="sphere" size="0.15" mass="1" condim="6"
            friction="0.8 0.3 0.05"/>
    </body>
  </worldbody>
</mujoco>
"""

# free body driven by site-transmission thrusters (force + torque wrench)
SITE_THRUSTER = """
<mujoco model="site_thruster">
  <option timestep="0.002"/>
  <worldbody>
    <body name="craft" pos="0 0 1">
      <freejoint/>
      <geom type="box" size="0.1 0.08 0.04" mass="1.5"/>
      <site name="nozzle" pos="0.1 0 -0.04" euler="0 20 0"/>
      <site name="rcs" pos="-0.1 0.05 0"/>
    </body>
  </worldbody>
  <actuator>
    <motor site="nozzle" gear="0 0 8 0 0 0" ctrlrange="-1 1"/>
    <motor site="rcs" gear="1 0 0 0 0.5 0.2" ctrlrange="-1 1"/>
  </actuator>
</mujoco>
"""

# box dropped onto a box (BASELINE "box stack drop" golden)
BOX_STACK = """
<mujoco model="box_stack">
  <option timestep="0.002" solver="Newton" iterations="30" tolerance="0"/>
  <worldbody>
    <geom name="floor" type="plane" size="5 5 0.1"/>
    <body name="a" pos="0 0 0.1">
      <freejoint/>
      <geom name="ga" type="box" size="0.1 0.15 0.1" mass="1"/>
    </body>
    <body name="b" pos="0.03 0.02 0.33">
      <freejoint/>
      <geom name="gb" type="box" size="0.08 0.06 0.1" mass="0.7"/>
    </body>
  </worldbody>
</mujoco>
"""

# capsule dropped onto a box face
CAPSULE_ON_BOX = """
<mujoco model="capsule_on_box">
  <option timestep="0.002" solver="Newton" iterations="30" tolerance="0"/>
  <worldbody>
    <body name="a" pos="0 0 0.1">
      <freejoint/>
      <geom name="ga" type="box" size="0.25 0.3 0.1" mass="2"/>
    </body>
    <body name="b" pos="0.0 0.05 0.3" euler="0 90 0">
      <freejoint/>
      <geom name="gb" type="capsule" size="0.05 0.15" mass="0.5"/>
    </body>
  </worldbody>
</mujoco>
"""

# cylinder dropped flat onto the floor
CYLINDER_DROP = """
<mujoco model="cylinder_drop">
  <option timestep="0.002" solver="Newton" iterations="30" tolerance="0"/>
  <worldbody>
    <geom name="floor" type="plane" size="5 5 0.1"/>
    <body name="c" pos="0 0 0.15">
      <freejoint/>
      <geom name="gc" type="cylinder" size="0.08 0.1" mass="1"/>
    </body>
    <body name="s" pos="0.3 0.0 0.4">
      <freejoint/>
      <geom name="gs" type="sphere" size="0.06" mass="0.3"/>
    </body>
  </worldbody>
</mujoco>
"""

# two-hinge finger with a fixed tendon: spring dead band, damping, limits,
# friction loss, and a tendon-transmission motor
TENDON_FINGER = """
<mujoco model="tendon_finger">
  <option timestep="0.002"/>
  <worldbody>
    <body name="proximal" pos="0 0 1">
      <joint name="j1" type="hinge" axis="0 1 0" damping="0.05"/>
      <geom type="capsule" fromto="0 0 0 0.25 0 0" size="0.02" mass="0.8"/>
      <body name="distal" pos="0.25 0 0">
        <joint name="j2" type="hinge" axis="0 1 0" damping="0.05"/>
        <geom type="capsule" fromto="0 0 0 0.2 0 0" size="0.015" mass="0.4"/>
      </body>
    </body>
  </worldbody>
  <tendon>
    <fixed name="couple" stiffness="3.0" damping="0.2" frictionloss="0.05"
           springlength="0.1 0.3" limited="true" range="-0.6 0.9">
      <joint joint="j1" coef="1.0"/>
      <joint joint="j2" coef="-0.5"/>
    </fixed>
  </tendon>
  <actuator>
    <motor name="pull" tendon="couple" gear="2" ctrlrange="-1 1"/>
  </actuator>
</mujoco>
"""

# ellipsoid tumbling onto the floor
ELLIPSOID_DROP = """
<mujoco model="ellipsoid_drop">
  <option timestep="0.002" solver="Newton" iterations="30" tolerance="0"/>
  <worldbody>
    <geom name="floor" type="plane" size="5 5 0.1"/>
    <body name="e" pos="0 0 0.2" euler="20 30 10">
      <freejoint/>
      <geom name="ge" type="ellipsoid" size="0.15 0.08 0.05" mass="1"/>
    </body>
  </worldbody>
</mujoco>
"""

# <replicate> meta-element (MuJoCo parser macro): cumulative offset+euler
# copies with zero-padded name suffixes
REPLICATE = """
<mujoco model="replicate">
  <option timestep="0.002"/>
  <worldbody>
    <replicate count="3" offset="0.2 0 0" euler="0 0 20">
      <body name="b" pos="0 0 1" euler="0 0 10">
        <joint name="j" type="hinge" axis="0 1 0" damping="0.1"/>
        <geom name="g" type="capsule" size="0.02" fromto="0 0 0 0.1 0 0"/>
        <site name="s" pos="0.1 0 0"/>
      </body>
    </replicate>
  </worldbody>
  <actuator>
    <motor joint="j0" gear="1"/>
    <motor joint="j2" gear="1"/>
  </actuator>
</mujoco>
"""

# <composite type="cable"> (the one composite MuJoCo 3.x keeps): ball-joint
# capsule chain along a polyline, parallel-transported frames, consecutive
# contact excludes, free initial joint
CABLE = """
<mujoco model="cable">
  <option timestep="0.002"/>
  <worldbody>
    <composite type="cable" vertex="0 0 1  0.1 0 1  0.2 0.05 1.02  0.3 0.1 1.1"
               prefix="C" initial="free">
      <geom type="capsule" size="0.008" mass="0.01" rgba="0.8 0.2 0.1 1"/>
      <joint kind="main" damping="0.015" armature="0.001" stiffness="0.5"/>
    </composite>
  </worldbody>
</mujoco>
"""

# curve-generated hanging cable, ball-anchored at the world
CABLE_HANG = """
<mujoco model="cable_hang">
  <option timestep="0.002"/>
  <worldbody>
    <composite type="cable" count="6" curve="s" size="0.6" offset="0.1 0 1"
               initial="ball">
      <geom type="capsule" size="0.01" density="800"/>
      <joint kind="main" damping="0.02"/>
    </composite>
  </worldbody>
</mujoco>
"""
