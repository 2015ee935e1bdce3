from viforsdes_tpu.models.encoder import ObservationContextEncoder
from viforsdes_tpu.models.head import DiffusionTransitionHead
from viforsdes_tpu.models.model import VariationalSDEPosterior
from viforsdes_tpu.models.theta_posterior import ThetaPosterior

__all__ = [
    "ObservationContextEncoder",
    "DiffusionTransitionHead",
    "VariationalSDEPosterior",
    "ThetaPosterior",
]
