from deepsc_gan_tpu.models.channel import (  # noqa: F401
    awgn,
    fading,
    channel,
    snr_to_noise,
    ChannelEncoder,
    ChannelDecoder,
    power_normalize,
)
from deepsc_gan_tpu.models.transformer import Encoder, Decoder  # noqa: F401
from deepsc_gan_tpu.models.gan import Generator, Discriminator, GeneratorCNN, DiscriminatorCNN  # noqa: F401
from deepsc_gan_tpu.models.transceiver import (  # noqa: F401
    Transceiver,
    TransceiverStarMulti,
    TransceiverStar,
    TransceiverGAN,
    make_model,
)
from deepsc_gan_tpu.models.star import SEncoder, SDecoder, SE, SD  # noqa: F401
from deepsc_gan_tpu.models.mine import MINE, sample_batch, mutual_information  # noqa: F401
