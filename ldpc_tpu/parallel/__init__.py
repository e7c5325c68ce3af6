"""SPMD scaling over TPU meshes: sharded MC sweeps and training."""

from ldpc_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    distributed_init,
    make_mesh,
    replicated,
)
from ldpc_tpu.parallel.sharding import (  # noqa: F401
    make_mc_trial,
    make_sharded_train_step,
    mc_sweep,
    shard_decode,
    tp_param_sharding,
)
