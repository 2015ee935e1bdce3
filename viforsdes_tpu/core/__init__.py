from viforsdes_tpu.core.observations import (
    GaussianObservationLikelihood,
    ObservationLikelihood,
    Observations,
)
from viforsdes_tpu.core.priors import Prior, PriorType
from viforsdes_tpu.core.sde import SDE, FunctionalSDE, make_sde
from viforsdes_tpu.core.solvers import euler_maruyama
from viforsdes_tpu.core.state_space import StateSpace

__all__ = [
    "SDE",
    "FunctionalSDE",
    "make_sde",
    "Observations",
    "ObservationLikelihood",
    "GaussianObservationLikelihood",
    "Prior",
    "PriorType",
    "euler_maruyama",
    "StateSpace",
]
