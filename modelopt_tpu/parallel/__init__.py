from .context import context_parallel_attention
from .mesh import (
    DECODER_RULES,
    make_mesh,
    shard_bundle,
    shard_variables,
    spec_for_path,
    variable_shardings,
)
from .multihost import hybrid_mesh, initialize
from .pipeline import (
    gpipe,
    pipeline_lm_forward,
    stack_pipeline_stages,
    stage_sharding,
    unstack_pipeline_stages,
)

__all__ = [
    "DECODER_RULES",
    "context_parallel_attention",
    "gpipe",
    "hybrid_mesh",
    "initialize",
    "make_mesh",
    "pipeline_lm_forward",
    "shard_bundle",
    "shard_variables",
    "spec_for_path",
    "stack_pipeline_stages",
    "stage_sharding",
    "unstack_pipeline_stages",
    "variable_shardings",
]
