"""spock_tpu — a TPU-native engine for multistage risk-averse optimal control
on scenario trees.

A from-scratch JAX/XLA/Pallas re-design of the capability surface of
``kul-optec/spock.jl``: scenario trees with uniform branching, linear
tree-indexed dynamics, quadratic costs, conic risk measures (AV@R, total
variation, ...), box constraints, solved by a Chambolle-Pock primal-dual
iteration optionally accelerated by SuperMann + Anderson (the SPOCK
algorithm).  Designed batch-first: thousands of independent MPC solves per
chip, sharded over a device mesh.
"""

from . import mpc, problem, risks, solver, zv  # noqa: F401
from .algorithms.common import SolveResult  # noqa: F401
from .algorithms.supermann import SuperMannOpts  # noqa: F401
from .problem import Box, Cost, Dynamics, Polytope, Spec, build  # noqa: F401
from .solver import Solver  # noqa: F401
from .tree import UniformTree  # noqa: F401

__version__ = "0.1.0"
