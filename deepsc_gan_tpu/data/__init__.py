from deepsc_gan_tpu.data.vocab import Vocab, SeqToText  # noqa: F401
from deepsc_gan_tpu.data.loader import (  # noqa: F401
    pad_sequences,
    Dataset,
    return_dataset,
    return_loader,
    synthetic_dataset,
)
