"""oxide_control_tpu: TPU-native RL environment engine.

A brand-new, TPU-first re-creation of the capabilities of
``rust-control/oxide_control`` (dm_control-style Environment/Task/Physics over
MuJoCo): the physics engine itself is implemented as pure jit/vmap-able JAX
functions over pytrees, with Pallas kernels on the hot constraint-solver path,
stepping thousands of environments in lockstep on TPU.
"""

from .model import (
    GeomType,
    Integrator,
    JointType,
    Model,
    Option,
    SolverType,
)
from .mjcf.compile import load_model, load_model_from_xml

__version__ = "0.1.0"

__all__ = [
    "GeomType",
    "Integrator",
    "JointType",
    "Model",
    "Option",
    "SolverType",
    "load_model",
    "load_model_from_xml",
]
