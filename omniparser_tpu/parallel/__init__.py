"""Device mesh, shardings, and batched multi-screenshot parse.

The reference has no distributed layer at all (SURVEY.md §2.7: HTTP-only);
here scale-out is first-class: data parallelism over screenshots/crops via
jax.sharding + jit (GSPMD inserts ICI collectives), tensor parallelism via
param shardings on the captioner's matmuls.
"""

from omniparser_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated,
    shard_params_fsdp_tp,
)

__all__ = ["make_mesh", "batch_sharding", "replicated", "shard_params_fsdp_tp"]
