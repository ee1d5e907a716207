"""multitreegp_tpu: a TPU-native genetic-programming framework.

Brand-new implementation of the capabilities of `sdevries0/MultiTreeGP`
(see SURVEY.md): multi-tree symbolic expression evolution with island
subpopulations against ODE-based fitness tasks, designed TPU-first
(fused population interpreter, lax.scan RK integrators, on-device
generation step, pjit/shard_map over ICI meshes).
"""
from .core.registry import FunctionSet, build_function_set
from .core.trees import TreeTensors, EMPTY, CONST

__version__ = "0.1.0"
from .strategy import GeneticProgramming
