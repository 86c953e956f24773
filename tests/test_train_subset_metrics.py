"""Index-aware train-metric accumulation for label-subset batches (grid
tiles / in-batch positives / shuffled samples): per-column tp/fp/fn counters
from different batches mean different labels and must scatter into
full-vocabulary totals, not sum column-wise."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from protnote_tpu.train.trainer import TrainConfusionAccumulator


def _metrics(tp, fp, fn):
    return {
        "tp": jnp.asarray(tp, jnp.int32),
        "fp": jnp.asarray(fp, jnp.int32),
        "fn": jnp.asarray(fn, jnp.int32),
    }


def test_full_vocab_fast_path():
    acc = TrainConfusionAccumulator(4)
    acc.update(_metrics([1, 0, 2, 0], [0, 1, 0, 0], [0, 0, 1, 1]))
    acc.update(_metrics([0, 1, 0, 3], [1, 0, 0, 0], [0, 0, 0, 0]))
    np.testing.assert_array_equal(np.asarray(acc.tp), [1, 1, 2, 3])
    m = acc.compute()
    assert 0 <= m["f1_micro"] <= 1


def test_subset_scatters_by_label_indices():
    acc = TrainConfusionAccumulator(6)
    # tile [1, 4]: counts land at labels 1 and 4
    acc.update(_metrics([2, 3], [1, 0], [0, 1]), label_indices=np.array([1, 4]))
    # tile [0, 5] with one padded column (width 3 > 2 real slots)
    acc.update(_metrics([5, 7, 99], [0, 1, 99], [1, 0, 99]),
               label_indices=np.array([0, 5]))
    np.testing.assert_array_equal(np.asarray(acc.tp), [5, 2, 0, 0, 3, 7])
    np.testing.assert_array_equal(np.asarray(acc.fp), [0, 1, 0, 0, 0, 1])
    np.testing.assert_array_equal(np.asarray(acc.fn), [1, 0, 0, 0, 1, 0])


def test_mixed_full_then_subset():
    acc = TrainConfusionAccumulator(3)
    acc.update(_metrics([1, 1, 1], [0, 0, 0], [0, 0, 0]))
    acc.update(_metrics([4], [1], [0]), label_indices=np.array([2]))
    np.testing.assert_array_equal(np.asarray(acc.tp), [1, 1, 5])


def test_varying_width_batches_do_not_crash():
    """in-batch sampling yields different label counts per batch (previously
    a broadcast error in train_one_epoch)."""
    acc = TrainConfusionAccumulator(10)
    acc.update(_metrics([1, 2], [0, 0], [0, 0]), label_indices=np.array([0, 1]))
    acc.update(_metrics([3, 4, 5], [0, 0, 0], [0, 0, 0]),
               label_indices=np.array([1, 2, 3]))
    np.testing.assert_array_equal(np.asarray(acc.tp)[:4], [1, 5, 4, 5])
    assert np.isfinite(acc.compute()["f1_macro"])


def test_grid_training_epoch(rng, tmp_path):
    """A full training epoch over grid label tiles runs and reports exact
    full-vocabulary confusion metrics."""
    from tests.test_device_label_gather import build_dataset

    from protnote_tpu.data.batching import BucketBatcher, GridBatcher
    from protnote_tpu.models.fusion import ProtNoteConfig, init_protnote
    from protnote_tpu.models.proteinfer import ProteInferConfig, init_proteinfer
    from protnote_tpu.train.losses import get_loss_fn
    from protnote_tpu.train.optim import make_optimizer
    from protnote_tpu.train.step import init_train_state
    from protnote_tpu.train.trainer import Trainer, TrainerConfig

    ds = build_dataset(rng, dataset_type="train", n_seqs=8, n_labels=10,
                       label_augmentation_descriptions=("name", "label"))
    PI = ProteInferConfig(output_channels=32, kernel_size=5, num_resnet_blocks=2,
                          num_labels=8)
    PN = ProtNoteConfig(protein_embedding_dim=32, label_embedding_dim=16,
                        latent_dim=16, projection_head_num_layers=2,
                        projection_head_hidden_dim_scale_factor=2,
                        output_mlp_num_layers=2, output_mlp_hidden_dim_scale_factor=2)
    pi_p, pi_s = init_proteinfer(jax.random.PRNGKey(0), PI)
    pn_p, pn_s = init_protnote(jax.random.PRNGKey(1), PN)
    tx = make_optimizer({"OPTIMIZER": "Adam", "LEARNING_RATE": 1e-3})
    loss_fn = get_loss_fn({"LOSS_FN": "BCE"})
    ts = init_train_state(pn_p, pn_s, pi_p, pi_s, tx)
    trainer = Trainer(ts, PI, PN, loss_fn, tx, TrainerConfig(decision_threshold=0.5))

    inner = BucketBatcher(ds, 4, buckets=(64,), shuffle=True, drop_last=True,
                          seed=0, device_label_gather=True)
    grid = GridBatcher(inner, labels_batch_size=4)
    m = trainer.train_one_epoch(grid, jax.random.PRNGKey(0))
    assert np.isfinite(m["loss"])
    assert 0 <= m["f1_micro"] <= 1

    # in-batch sampling (varying widths) also completes
    b2 = BucketBatcher(ds, 4, buckets=(64,), shuffle=True, drop_last=True,
                       seed=1, in_batch_sampling=True, device_label_gather=True)
    m2 = trainer.train_one_epoch(b2, jax.random.PRNGKey(1))
    assert np.isfinite(m2["loss"])
