from .attention import (
    attention_pallas,
    attention_reference,
    flash_attention,
    multi_head_attention,
)
from .dilated_conv import (
    dilated_residual_fused,
    dilated_residual_pallas,
    dilated_residual_reference,
)
from .fused_norm import (
    blur_pool,
    fused_scale_bias_act,
    fused_scale_bias_act_reference,
    space_to_depth,
)

__all__ = [
    "attention_pallas", "attention_reference", "flash_attention",
    "multi_head_attention",
    "dilated_residual_fused", "dilated_residual_pallas",
    "dilated_residual_reference",
    "blur_pool", "fused_scale_bias_act", "fused_scale_bias_act_reference",
    "space_to_depth",
]
