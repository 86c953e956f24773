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
