from .context import (
    all_gather_keys,
    halo_exchange,
    sequence_parallel_attention,
    sequence_parallel_dilated_conv,
)
from .pipeline import (
    pipeline_blocks,
    stack_block_params,
)
from .swin_pipeline import (
    extract_stage_pairs,
    pipelined_swin_stage,
)
from .tp import (
    shard_params_tp,
    shard_state_tp,
    sharded_leaf_count,
    tp_shardings,
)
from .mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    SEQ_AXIS,
    batch_sharding,
    make_mesh,
    replicate,
    replicated,
    seq_sharding,
    shard_batch,
)

__all__ = [
    "DATA_AXIS", "SEQ_AXIS", "MODEL_AXIS",
    "make_mesh", "batch_sharding", "seq_sharding", "replicated",
    "shard_batch", "replicate",
    "sequence_parallel_attention", "sequence_parallel_dilated_conv",
    "halo_exchange", "all_gather_keys",
    "tp_shardings", "shard_params_tp", "shard_state_tp",
    "sharded_leaf_count",
    "pipeline_blocks", "stack_block_params",
    "extract_stage_pairs", "pipelined_swin_stage",
]
