from .environment import BatchedEnvironment, Environment, Task, TimeStep
from .errors import (
    ActuatorStatelessError,
    BodyNotMocapError,
    JointTypeError,
    ModelError,
    NameNotFoundError,
    OxideControlError,
    PhysicsDivergedError,
    UnsupportedFeatureError,
)
from .physics import Actuators, Physics, MAXVAL, MINVAL

__all__ = [
    "Actuators",
    "ActuatorStatelessError",
    "BatchedEnvironment",
    "BodyNotMocapError",
    "Environment",
    "JointTypeError",
    "MAXVAL",
    "MINVAL",
    "ModelError",
    "NameNotFoundError",
    "OxideControlError",
    "Physics",
    "PhysicsDivergedError",
    "Task",
    "TimeStep",
    "UnsupportedFeatureError",
]
