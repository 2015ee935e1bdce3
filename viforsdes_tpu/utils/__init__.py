from viforsdes_tpu.utils.console import Console
from viforsdes_tpu.utils.profiling import benchmark, timed, trace
from viforsdes_tpu.utils.pytree_io import load_checkpoint, save_checkpoint

__all__ = ["Console", "benchmark", "timed", "trace", "save_checkpoint", "load_checkpoint"]
