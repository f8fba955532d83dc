from deepsc_gan_tpu.ops.positional import positional_encoding  # noqa: F401
from deepsc_gan_tpu.ops.masks import (  # noqa: F401
    create_padding_mask,
    create_look_ahead_mask,
    create_masks,
)
from deepsc_gan_tpu.ops.losses import loss_function, cross_entropy_per_token  # noqa: F401
from deepsc_gan_tpu.ops.schedule import noam_schedule, make_optimizer  # noqa: F401
from deepsc_gan_tpu.ops.attention import MultiHeadAttention  # noqa: F401
