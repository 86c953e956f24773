"""Shared tiny-model setup for the multi-process distributed test: both the
2-process workers and the single-process reference build EXACTLY this state
and batch (fixed PRNG keys / rng seeds), so their losses must agree."""

import numpy as np

import jax
import jax.numpy as jnp

from protnote_tpu.models.fusion import ProtNoteConfig, init_protnote
from protnote_tpu.models.proteinfer import ProteInferConfig, init_proteinfer
from protnote_tpu.train.losses import get_loss_fn
from protnote_tpu.train.optim import make_optimizer
from protnote_tpu.train.step import init_train_state

B, T, L, M, D = 8, 32, 16, 24, 16


def make_setup():
    pi_cfg = ProteInferConfig(output_channels=32, kernel_size=5,
                              num_resnet_blocks=2, num_labels=8)
    pn_cfg = ProtNoteConfig(
        protein_embedding_dim=32, label_embedding_dim=D, latent_dim=16,
        projection_head_num_layers=2, projection_head_hidden_dim_scale_factor=2,
        output_mlp_num_layers=2, output_mlp_hidden_dim_scale_factor=2,
    )
    pi_p, pi_s = init_proteinfer(jax.random.PRNGKey(0), pi_cfg)
    pn_p, pn_s = init_protnote(jax.random.PRNGKey(1), pn_cfg)
    tx = make_optimizer({"OPTIMIZER": "Adam", "LEARNING_RATE": 1e-3,
                         "CLIP_VALUE": 1.0})
    loss_fn = get_loss_fn({"LOSS_FN": "FocalLoss", "FOCAL_LOSS_GAMMA": 2,
                           "FOCAL_LOSS_ALPHA": -1})
    ts = init_train_state(pn_p, pn_s, pi_p, pi_s, tx)

    rng = np.random.default_rng(0)
    batch = {
        "aa_ids": rng.integers(0, 20, (B, T)).astype(np.int8),
        "lengths": rng.integers(8, T, (B,)).astype(np.int32),
        "example_mask": np.ones((B,), np.float32),
        # device-resident label path: gather indices + resident view matrix
        "label_rows": rng.integers(0, M, (L,)).astype(np.int32),
        "label_matrix": rng.normal(size=(M, D)).astype(np.float32),
        "label_multihots": (rng.random((B, L)) < 0.3).astype(np.float32),
    }
    return ts, pi_cfg, pn_cfg, loss_fn, tx, batch
