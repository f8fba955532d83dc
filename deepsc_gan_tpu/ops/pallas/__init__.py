from deepsc_gan_tpu.ops.pallas.star import (  # noqa: F401
    star_satellite_attention,
    set_star_kernel_mode,
    star_kernel_mode,
)
