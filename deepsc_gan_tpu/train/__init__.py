from deepsc_gan_tpu.train.attacks import fgm_normalize, fgm_perturbation  # noqa: F401
from deepsc_gan_tpu.train.steps import (  # noqa: F401
    TrainState,
    create_train_state,
    make_train_step,
    make_train_attack_step,
    make_eval_step,
)
from deepsc_gan_tpu.train.gan_steps import make_gan_train_step, make_gan_eval_step  # noqa: F401
from deepsc_gan_tpu.train.mine_steps import make_mine_train_step  # noqa: F401
