"""aslr_to_tpu — TPU-native trajectory optimization for articulated soft robots.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
reference prototype ``spykspeigel/aslr_to`` (Crocoddyl + Pinocchio based):
soft-actuation dynamics (SEA / VSA), rigid-body dynamics kernels, a
cost/residual library, and the DDP/FDDP/BoxDDP solver family — all as pure
jittable functions that batch with vmap and shard over device meshes.
"""

from .models.state import StateASR, StateMultibody
from .models.actuation import ASRActuation, VSAASRActuation, ActuationModelDoublePendulum
from .models.dynamics import (
    DifferentialSEADynamics,
    DifferentialVSADynamics,
    DifferentialFreeFwdDynamics,
)
from .models.integrator import IntegratedActionEuler
from .models.costs import (
    ActivationBounds,
    ActivationModelQuad,
    ActivationModelQuadraticBarrier,
    ActivationModelWeightedQuad,
    CostModelDoublePendulum,
    CostModelResidual,
    CostModelStiffness,
    CostModelSum,
    ResidualModelControl,
    ResidualModelDoublePendulum,
    ResidualModelFramePlacementASR,
    ResidualModelState,
)
from .models.condensed import (
    ASRActuationCondensed,
    QbActuationModel,
    SoftDynamicsResidualModel,
    VSADynamicsResidualModel,
)
from .models import robots
from .solvers.problem import ShootingProblem
from .solvers.ddp import (
    Bounds,
    SolverBoxDDP,
    SolverBoxFDDP,
    SolverDDP,
    SolverFDDP,
    SolverSettings,
    solve,
)
from .solvers.homotopy import homotopy_solve, scale_terminal_costs

# Reference-compatible aliases (names from python/aslr_to/__init__.py:1-9).
StateMultibodyASR = StateASR
DifferentialFreeASRFwdDynamicsModel = DifferentialSEADynamics
DifferentialFreeFwdDynamicsModelVSA = DifferentialVSADynamics
IntegratedActionModelEulerASR = IntegratedActionEuler

__all__ = [name for name in dir() if not name.startswith("_")]
__version__ = "0.1.0"
