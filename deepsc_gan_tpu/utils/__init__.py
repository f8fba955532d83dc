from deepsc_gan_tpu.utils.config import Config, default_config, para_config  # noqa: F401
