from viforsdes_tpu.inference.elbo import compute_evidence_lower_bound
from viforsdes_tpu.inference.ema import ema_init, ema_update
from viforsdes_tpu.inference.path_sampler import sample_diffusion_paths
from viforsdes_tpu.inference.trainer import TrainingState, VariationalInferenceTrainer

__all__ = [
    "compute_evidence_lower_bound",
    "ema_init",
    "ema_update",
    "sample_diffusion_paths",
    "VariationalInferenceTrainer",
    "TrainingState",
]
