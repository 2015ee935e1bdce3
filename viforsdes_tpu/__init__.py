"""viforsdes_tpu: TPU-native black-box variational inference for SDEs.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
Tom-Ryder/VIforSDEs (Ryder et al., ICML 2018): joint variational inference of
SDE parameters and latent diffusion paths via a reparameterized Monte-Carlo
ELBO, with a SiT observation-context encoder, a recurrent Gaussian transition
head, and a fused TPU path sampler.
"""

from viforsdes_tpu.config import (
    ComputeDtype,
    EncoderConfig,
    HeadConfig,
    PretrainConfig,
    TrainingConfig,
)
from viforsdes_tpu.core import (
    SDE,
    FunctionalSDE,
    GaussianObservationLikelihood,
    Observations,
    ObservationLikelihood,
    Prior,
    PriorType,
    StateSpace,
    euler_maruyama,
    make_sde,
)
from viforsdes_tpu.infer import InferenceConfig, infer
from viforsdes_tpu.inference.trainer import TrainingState, VariationalInferenceTrainer
from viforsdes_tpu.models.model import VariationalSDEPosterior
from viforsdes_tpu.parallel.mesh import make_data_mesh
from viforsdes_tpu.posterior.posterior import VariationalPosterior
from viforsdes_tpu.utils.console import Console

__version__ = "0.1.0"

__all__ = [
    "SDE",
    "FunctionalSDE",
    "make_sde",
    "Observations",
    "ObservationLikelihood",
    "GaussianObservationLikelihood",
    "Prior",
    "PriorType",
    "StateSpace",
    "euler_maruyama",
    "InferenceConfig",
    "infer",
    "VariationalInferenceTrainer",
    "TrainingState",
    "VariationalPosterior",
    "VariationalSDEPosterior",
    "Console",
    "TrainingConfig",
    "EncoderConfig",
    "HeadConfig",
    "PretrainConfig",
    "ComputeDtype",
    "make_data_mesh",
]
