from .mesh import (
    DECODER_RULES,
    make_mesh,
    shard_bundle,
    shard_variables,
    spec_for_path,
    variable_shardings,
)

__all__ = [
    "DECODER_RULES",
    "make_mesh",
    "shard_bundle",
    "shard_variables",
    "spec_for_path",
    "variable_shardings",
]
