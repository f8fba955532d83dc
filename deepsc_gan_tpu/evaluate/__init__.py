from deepsc_gan_tpu.evaluate.greedy import (  # noqa: F401
    make_greedy_decode,
    make_greedy_decode_attack,
    make_greedy_decode_gan,
)
from deepsc_gan_tpu.evaluate.metrics import BleuScore, SNR_to_noise, Similarity  # noqa: F401
from deepsc_gan_tpu.evaluate.evaluator import snr_sweep_bleu, save_result_table  # noqa: F401
