from .asl import asymmetric_loss
from .bce import (
    TARGET_POS_WEIGHT,
    TOOL_POS_WEIGHT,
    VERB_POS_WEIGHT,
    bce_with_logits,
)
from .components import component_labels, component_max_logits
from .distill import distill_kl, mse_feature_kd
from .fusion import fpn_level_loss, tcn_multitask_loss
from .kcl import (
    k_positive_mask,
    kcl_loss,
    kcl_proto_loss,
    ldam_loss,
    supcon_ccl_loss,
    supcon_rank_loss,
)

__all__ = [
    "asymmetric_loss",
    "bce_with_logits",
    "TOOL_POS_WEIGHT",
    "VERB_POS_WEIGHT",
    "TARGET_POS_WEIGHT",
    "component_labels",
    "component_max_logits",
    "distill_kl",
    "mse_feature_kd",
    "fpn_level_loss",
    "tcn_multitask_loss",
    "k_positive_mask",
    "kcl_loss",
    "kcl_proto_loss",
    "ldam_loss",
    "supcon_ccl_loss",
    "supcon_rank_loss",
]
