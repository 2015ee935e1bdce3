from viforsdes_tpu.ops.attention import AttentionConfig, attention, attention_init
from viforsdes_tpu.ops.bounds import lower_bound, lower_bound_grad_mask
from viforsdes_tpu.ops.cond import CondBranch, cond_modulator, cond_modulator_init
from viforsdes_tpu.ops.embeddings import (
    RotaryTables,
    apply_rope_1d,
    precompute_rope,
    sinusoidal_embedding,
)
from viforsdes_tpu.ops.initializers import (
    DEFAULT_INIT_POLICY,
    InitPolicy,
    linear,
    linear_init,
    trunc_normal_init,
    zeros_init,
)
from viforsdes_tpu.ops.mlp import swiglu, swiglu_init
from viforsdes_tpu.ops.norms import layer_norm, rms_norm
from viforsdes_tpu.ops.sit import SiTConfig, sit, sit_block, sit_block_init, sit_init

__all__ = [
    "AttentionConfig",
    "attention",
    "attention_init",
    "lower_bound",
    "lower_bound_grad_mask",
    "CondBranch",
    "cond_modulator",
    "cond_modulator_init",
    "RotaryTables",
    "apply_rope_1d",
    "precompute_rope",
    "sinusoidal_embedding",
    "DEFAULT_INIT_POLICY",
    "InitPolicy",
    "linear",
    "linear_init",
    "trunc_normal_init",
    "zeros_init",
    "swiglu",
    "swiglu_init",
    "layer_norm",
    "rms_norm",
    "SiTConfig",
    "sit",
    "sit_block",
    "sit_block_init",
    "sit_init",
]
