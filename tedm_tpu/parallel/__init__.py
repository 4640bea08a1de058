"""Device-mesh parallelism layer.

The reference is single-process, single-device (SURVEY §2.3: no
torch.distributed / NCCL anywhere). This package provides the TPU-native
capabilities the rebuild adds as first-class features:

* a named ``jax.sharding.Mesh`` over the slice ("data" axis for DP,
  "model" axis reserved for TP of wide layers),
* sharding rules for params / batches / optimizer state,
* jit-compiled train steps whose gradient reduction rides ICI via the
  XLA collectives GSPMD inserts (no hand-written psum needed).
"""

from tedm_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated_sharding,
    param_shardings,
    shard_batch,
    data_parallel_setup,
)
