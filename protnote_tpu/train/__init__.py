from protnote_tpu.train.losses import (
    focal_loss,
    bce_with_logits,
    weighted_bce,
    batch_weighted_bce,
    batch_label_weighted_bce,
    cb_loss,
    rgd_bce,
    supcon_loss,
    get_loss_fn,
)
from protnote_tpu.train.optim import make_optimizer
from protnote_tpu.train.step import (
    batch_to_device_dict,
    init_train_state,
    make_eval_step,
    make_train_step,
)
from protnote_tpu.train.trainer import Trainer, TrainerConfig
