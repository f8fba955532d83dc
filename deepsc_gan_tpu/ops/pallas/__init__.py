from deepsc_gan_tpu.ops.pallas.star import (  # noqa: F401
    set_star_kernel_mesh,
    set_star_kernel_mode,
    star_kernel_mesh,
    star_kernel_mode,
    star_satellite_attention,
    star_satellite_attention_sharded,
)
