from ddmi_tpu.parallel.mesh import (
    MeshSpec,
    batch_sharding,
    make_mesh,
    replicated,
    shard_params_fsdp,
)

__all__ = [
    "MeshSpec",
    "make_mesh",
    "batch_sharding",
    "replicated",
    "shard_params_fsdp",
]
