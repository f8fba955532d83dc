from deepsc_gan_tpu.parallel.mesh import make_mesh, local_mesh  # noqa: F401
from deepsc_gan_tpu.parallel.sharding import (  # noqa: F401
    shard_batch,
    replicate,
    make_parallel_train_step,
    make_parallel_snr_sweep,
    make_parallel_greedy_sweep,
)
