"""Device-mesh parallelism: jax.sharding + pjit over ICI.

The reference's only device parallelism is PyTorch-Lightning's default
multi-GPU path, unused by every shipped config (reference: main.py:41-50,
configs/*.yml num_gpus: [0]). Here parallelism is first-class: a named mesh
with `data` (batch) and `model` (tensor) axes; XLA inserts the collectives.
"""

from faceformer_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    param_partition_specs,
    replicated,
    shard_batch,
    shard_params,
)
