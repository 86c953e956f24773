"""Calibrated static int8 activation scales (VERDICT r2 weak #3) and the
adversarial-outlier stress test for the subsample-max dynamic clip."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from protnote_tpu.models.fusion import (
    ProtNoteConfig,
    calibrate_int8,
    init_protnote,
    protnote_forward,
)
from protnote_tpu.ops.pair_scorer import (
    calibrate_act_scales,
    fold_output_mlp,
    pair_logits_tiled,
    pair_logits_tiled_int8,
    quantize_folded,
)


def _small(seed=0):
    cfg = ProtNoteConfig(
        protein_embedding_dim=24, label_embedding_dim=24, latent_dim=16,
        projection_head_num_layers=2, output_mlp_num_layers=3,
        output_mlp_hidden_dim_scale_factor=2, label_tile=8,
    )
    params, state = init_protnote(jax.random.PRNGKey(seed), cfg)
    folded = fold_output_mlp(params["output_mlp"], state["output_mlp"],
                             "concatenation", cfg.latent_dim)
    return cfg, params, state, folded


def test_static_scales_close_to_dynamic_and_f32():
    cfg, params, state, folded = _small()
    rng = np.random.default_rng(0)
    P_e = jnp.asarray(rng.normal(size=(6, 16)).astype(np.float32))
    L_e = jnp.asarray(rng.normal(size=(21, 16)).astype(np.float32))

    scales = calibrate_act_scales(folded, P_e, L_e, label_tile=8)
    assert len(scales) == len(folded.hidden)
    assert all(s > 0 for s in scales)

    ref = np.asarray(pair_logits_tiled(folded, P_e, L_e, label_tile=8,
                                       compute_dtype=jnp.float32))
    got = np.asarray(pair_logits_tiled_int8(
        quantize_folded(folded, act_scales=scales), P_e, L_e,
        label_tile=8, compute_dtype=jnp.float32,
    ))
    p_ref = 1 / (1 + np.exp(-ref))
    p_got = 1 / (1 + np.exp(-got))
    assert np.max(np.abs(p_ref - p_got)) < 1.5e-2
    assert np.corrcoef(ref.ravel(), got.ravel())[0, 1] > 0.999


def test_static_scales_generalise_to_fresh_batch():
    """Scales calibrated on one batch hold on a differently-drawn batch
    (the frozen model's relu ranges are batch-stable; out-of-range rows
    clip at +-127 with bounded error)."""
    cfg, params, state, folded = _small(seed=3)
    rng = np.random.default_rng(1)
    P_cal = jnp.asarray(rng.normal(size=(6, 16)).astype(np.float32))
    L_e = jnp.asarray(rng.normal(size=(21, 16)).astype(np.float32))
    scales = calibrate_act_scales(folded, P_cal, L_e, label_tile=8)

    P_new = jnp.asarray(rng.normal(size=(9, 16)).astype(np.float32))
    ref = np.asarray(pair_logits_tiled(folded, P_new, L_e, label_tile=8,
                                       compute_dtype=jnp.float32))
    got = np.asarray(pair_logits_tiled_int8(
        quantize_folded(folded, act_scales=scales), P_new, L_e,
        label_tile=8, compute_dtype=jnp.float32,
    ))
    p_diff = np.abs(1 / (1 + np.exp(-ref)) - 1 / (1 + np.exp(-got)))
    assert np.max(p_diff) < 3e-2


def test_config_backend_uses_static_scales():
    cfg, params, state, folded = _small(seed=5)
    rng = np.random.default_rng(2)
    P_f = jnp.asarray(rng.normal(size=(6, 24)).astype(np.float32))
    L_f = jnp.asarray(rng.normal(size=(21, 24)).astype(np.float32))
    scales = calibrate_int8(params, state, P_f, cfg, label_embeddings=L_f)
    cfg8s = dataclasses.replace(cfg, pair_backend="tiled_int8",
                                int8_act_scales=scales)
    lg_s, _ = protnote_forward(params, state, P_f, L_f, cfg8s, train=False)
    lg, _ = protnote_forward(params, state, P_f, L_f, cfg, train=False)
    assert np.max(np.abs(1 / (1 + np.exp(-np.asarray(lg_s)))
                         - 1 / (1 + np.exp(-np.asarray(lg))))) < 2e-2
    # from_params plumbing
    cfg_p = ProtNoteConfig.from_params(
        {"PAIR_BACKEND": "tiled_int8", "INT8_ACT_SCALES": list(scales)}
    )
    assert cfg_p.int8_act_scales == tuple(float(s) for s in scales)


def test_quantize_folded_scale_count_mismatch():
    cfg, params, state, folded = _small()
    with pytest.raises(ValueError, match="act_scales"):
        quantize_folded(folded, act_scales=(1.0,))


def test_dynamic_subsample_outlier_clip_bounded():
    """Adversarial distribution for the 1/8-column subsample row max: a row
    whose ONLY outlier sits in skipped columns under-scales and clips at
    +-127.  The resulting error must stay bounded (clip, not wrap) and the
    benign rows must be unaffected (VERDICT r2 weak #3 tail risk)."""
    H = 2048  # wide enough to trigger the stride-8 subsample
    rng = np.random.default_rng(7)
    W = rng.normal(size=(H, 32)).astype(np.float32) * 0.05
    b = np.zeros(32, np.float32)

    from protnote_tpu.ops.pair_scorer import Int8FoldedOutputMLP

    s_w = np.maximum(np.abs(W).max(axis=0), 1e-12) / 127.0
    Wq = np.clip(np.round(W / s_w[None, :]), -127, 127).astype(np.int8)

    # emulate one hidden layer via the module's own quantize math by calling
    # the tiled scorer on a 1-hidden-layer folded MLP
    folded_like = Int8FoldedOutputMLP(
        w1_p=jnp.eye(H, dtype=jnp.bfloat16)[:, :H],
        w1_l=jnp.zeros((H, H), jnp.bfloat16),
        b1=jnp.zeros(H, jnp.float32),
        hidden_q=[(jnp.asarray(Wq), jnp.asarray(s_w), jnp.asarray(b))],
        w_out=jnp.ones(32, jnp.float32) / 32.0,
        b_out=jnp.float32(0.0),
    )
    # benign activations plus one adversarial row: a single huge value at a
    # column index skipped by the ::8 subsample (index 3)
    X = np.abs(rng.normal(size=(8, H))).astype(np.float32)
    X[5] = 0.01
    X[5, 3] = 50.0  # outlier invisible to the subsampled max

    got = np.asarray(pair_logits_tiled_int8(
        folded_like, jnp.asarray(X), jnp.zeros((1, H), jnp.float32),
        label_tile=1, compute_dtype=jnp.float32,
    ))[:, 0]

    # exact f32 reference for the same 1-layer network
    h_ref = X @ W + b  # X >= 0 so relu(pre1) == X
    ref = (np.maximum(h_ref, 0.0) * (1.0 / 32.0)).sum(axis=1)

    benign = np.delete(np.arange(8), 5)
    # benign rows: tight agreement
    assert np.max(np.abs(got[benign] - ref[benign])) < 0.05 * (
        1.0 + np.max(np.abs(ref[benign])))
    # adversarial row: the outlier clips at 127 * s_act (clip, never wrap);
    # the result must match the CLIP MODEL — the exact network evaluated
    # with x[3] clamped to the clip ceiling — not the unclipped value
    s_act = max(np.max(X[5, ::8]) * 1.3, 1e-12) / 127.0
    X_clip = X[5].copy()
    X_clip[3] = min(X_clip[3], 127.0 * s_act)
    ref_clip = (np.maximum(X_clip @ W + b, 0.0) * (1.0 / 32.0)).sum()
    assert np.isfinite(got[5])
    assert abs(got[5] - ref_clip) < 0.05 * (1.0 + abs(ref_clip))
    # and the clipped result differs materially from the unclipped exact
    # value — i.e. this test genuinely exercises the clip path
    assert abs(ref[5] - ref_clip) > 10 * abs(got[5] - ref_clip)


def test_trainer_auto_calibrates_int8_on_evaluate(rng):
    """CLI/Trainer wiring: with PAIR_BACKEND=tiled_int8 and no supplied
    scales, the first evaluate() calibrates static activation scales from
    the first batch (INT8_CALIBRATE default); INT8_CALIBRATE=False keeps
    the dynamic per-row path."""
    from protnote_tpu.data.batching import BucketBatcher
    from protnote_tpu.models.proteinfer import ProteInferConfig, init_proteinfer
    from protnote_tpu.train.losses import get_loss_fn
    from protnote_tpu.train.optim import make_optimizer
    from protnote_tpu.train.step import init_train_state
    from protnote_tpu.train.trainer import Trainer, TrainerConfig
    from tests.test_device_label_gather import build_dataset

    PI = ProteInferConfig(output_channels=32, kernel_size=5,
                          num_resnet_blocks=2, num_labels=8)
    PN = ProtNoteConfig(protein_embedding_dim=32, label_embedding_dim=16,
                        latent_dim=16, projection_head_num_layers=2,
                        projection_head_hidden_dim_scale_factor=2,
                        output_mlp_num_layers=2,
                        output_mlp_hidden_dim_scale_factor=2,
                        label_tile=8, pair_backend="tiled_int8")
    pi_p, pi_s = init_proteinfer(jax.random.PRNGKey(0), PI)
    pn_p, pn_s = init_protnote(jax.random.PRNGKey(1), PN)
    tx = make_optimizer({"OPTIMIZER": "Adam", "LEARNING_RATE": 1e-3})
    loss_fn = get_loss_fn({"LOSS_FN": "BCE"})
    ds = build_dataset(rng)

    ts = init_train_state(pn_p, pn_s, pi_p, pi_s, tx)
    tr = Trainer(ts, PI, PN, loss_fn, tx, TrainerConfig())
    assert tr.pn_cfg.int8_act_scales is None
    m = tr.evaluate(BucketBatcher(ds, 4, buckets=(64,)))["metrics"]
    assert tr.pn_cfg.int8_act_scales is not None
    assert all(s > 0 for s in tr.pn_cfg.int8_act_scales)
    assert np.isfinite(m["loss"])
    # second evaluate must NOT recalibrate (scales are frozen)
    frozen = tr.pn_cfg.int8_act_scales
    tr.evaluate(BucketBatcher(ds, 4, buckets=(64,)))
    assert tr.pn_cfg.int8_act_scales is frozen

    ts2 = init_train_state(pn_p, pn_s, pi_p, pi_s, tx)
    tr2 = Trainer(ts2, PI, PN, loss_fn, tx,
                  TrainerConfig(int8_calibrate=False))
    tr2.evaluate(BucketBatcher(ds, 4, buckets=(64,)))
    assert tr2.pn_cfg.int8_act_scales is None


def test_training_invalidates_auto_int8_scales(rng):
    """Auto-calibrated scales are a function of the weights: a training
    epoch resets them so the next evaluate() recalibrates (a frozen stale
    scale would clip activations that outgrew its margin)."""
    from protnote_tpu.data.batching import BucketBatcher
    from protnote_tpu.models.proteinfer import ProteInferConfig, init_proteinfer
    from protnote_tpu.train.losses import get_loss_fn
    from protnote_tpu.train.optim import make_optimizer
    from protnote_tpu.train.step import init_train_state
    from protnote_tpu.train.trainer import Trainer, TrainerConfig
    from tests.test_device_label_gather import build_dataset

    PI = ProteInferConfig(output_channels=32, kernel_size=5,
                          num_resnet_blocks=2, num_labels=8)
    PN = ProtNoteConfig(protein_embedding_dim=32, label_embedding_dim=16,
                        latent_dim=16, projection_head_num_layers=2,
                        projection_head_hidden_dim_scale_factor=2,
                        output_mlp_num_layers=2,
                        output_mlp_hidden_dim_scale_factor=2,
                        label_tile=8, pair_backend="tiled_int8")
    pi_p, pi_s = init_proteinfer(jax.random.PRNGKey(0), PI)
    pn_p, pn_s = init_protnote(jax.random.PRNGKey(1), PN)
    tx = make_optimizer({"OPTIMIZER": "Adam", "LEARNING_RATE": 1e-2})
    loss_fn = get_loss_fn({"LOSS_FN": "BCE"})
    tr = Trainer(init_train_state(pn_p, pn_s, pi_p, pi_s, tx),
                 PI, PN, loss_fn, tx, TrainerConfig())

    eval_ds = build_dataset(rng)
    train_ds = build_dataset(rng, dataset_type="train", n_seqs=8)
    tr.evaluate(BucketBatcher(eval_ds, 4, buckets=(64,)))
    first = tr.pn_cfg.int8_act_scales
    assert first is not None
    tr.train_one_epoch(
        BucketBatcher(train_ds, 4, buckets=(64,), shuffle=True,
                      drop_last=True, seed=0),
        jax.random.PRNGKey(0),
    )
    assert tr.pn_cfg.int8_act_scales is None  # invalidated by training
    tr.evaluate(BucketBatcher(eval_ds, 4, buckets=(64,)))
    assert tr.pn_cfg.int8_act_scales is not None  # recalibrated

    # user-supplied scales are never invalidated (fresh params: the first
    # trainer's donated steps consumed the arrays above)
    pi_p2, pi_s2 = init_proteinfer(jax.random.PRNGKey(0), PI)
    pn_p2, pn_s2 = init_protnote(jax.random.PRNGKey(1), PN)
    tr2 = Trainer(init_train_state(pn_p2, pn_s2, pi_p2, pi_s2, tx),
                  PI, PN, loss_fn, tx, TrainerConfig())
    tr2.pn_cfg = dataclasses.replace(tr2.pn_cfg, int8_act_scales=first)
    tr2.train_one_epoch(
        BucketBatcher(train_ds, 4, buckets=(64,), shuffle=True,
                      drop_last=True, seed=0),
        jax.random.PRNGKey(0),
    )
    assert tr2.pn_cfg.int8_act_scales == first


def test_checkpoint_restore_invalidates_auto_int8_scales(rng, tmp_path):
    """A restored checkpoint carries DIFFERENT weights from the ones the
    auto scales were calibrated on (e.g. the best-epoch reload after
    training) — load() must drop them so the next evaluate recalibrates;
    user-supplied scales survive a restore untouched."""
    from protnote_tpu.core.checkpoint import save_checkpoint
    from protnote_tpu.data.batching import BucketBatcher
    from protnote_tpu.models.proteinfer import ProteInferConfig, init_proteinfer
    from protnote_tpu.train.losses import get_loss_fn
    from protnote_tpu.train.optim import make_optimizer
    from protnote_tpu.train.step import init_train_state
    from protnote_tpu.train.trainer import Trainer, TrainerConfig
    from tests.test_device_label_gather import build_dataset

    PI = ProteInferConfig(output_channels=32, kernel_size=5,
                          num_resnet_blocks=2, num_labels=8)
    PN = ProtNoteConfig(protein_embedding_dim=32, label_embedding_dim=16,
                        latent_dim=16, projection_head_num_layers=2,
                        projection_head_hidden_dim_scale_factor=2,
                        output_mlp_num_layers=2,
                        output_mlp_hidden_dim_scale_factor=2,
                        label_tile=8, pair_backend="tiled_int8")
    pi_p, pi_s = init_proteinfer(jax.random.PRNGKey(0), PI)
    pn_p, pn_s = init_protnote(jax.random.PRNGKey(1), PN)
    tx = make_optimizer({"OPTIMIZER": "Adam", "LEARNING_RATE": 1e-3})
    loss_fn = get_loss_fn({"LOSS_FN": "BCE"})
    ds = build_dataset(rng)
    path = str(tmp_path / "ckpt.msgpack")

    tr = Trainer(init_train_state(pn_p, pn_s, pi_p, pi_s, tx),
                 PI, PN, loss_fn, tx, TrainerConfig())
    save_checkpoint(path, tr.ts, epoch=0)
    tr.evaluate(BucketBatcher(ds, 4, buckets=(64,)))
    assert tr.pn_cfg.int8_act_scales is not None
    tr.load(path)
    assert tr.pn_cfg.int8_act_scales is None  # invalidated by the restore
    tr.evaluate(BucketBatcher(ds, 4, buckets=(64,)))
    assert tr.pn_cfg.int8_act_scales is not None  # recalibrated

    # user-supplied scales: restore keeps them
    supplied = tr.pn_cfg.int8_act_scales
    pi_p2, pi_s2 = init_proteinfer(jax.random.PRNGKey(0), PI)
    pn_p2, pn_s2 = init_protnote(jax.random.PRNGKey(1), PN)
    PN_s = dataclasses.replace(PN, int8_act_scales=supplied)
    tr2 = Trainer(init_train_state(pn_p2, pn_s2, pi_p2, pi_s2, tx),
                  PI, PN_s, loss_fn, tx, TrainerConfig())
    tr2.load(path)
    assert tr2.pn_cfg.int8_act_scales == supplied


def test_threshold_sweep_without_multihots_fails_loudly(rng):
    """evaluate(threshold_sweep=...) on a batcher that carries no
    label_multihots must raise, not ship a garbage threshold."""
    import pytest

    from protnote_tpu.data.batching import BucketBatcher
    from protnote_tpu.models.proteinfer import ProteInferConfig, init_proteinfer
    from protnote_tpu.train.losses import get_loss_fn
    from protnote_tpu.train.optim import make_optimizer
    from protnote_tpu.train.step import init_train_state
    from protnote_tpu.train.trainer import Trainer, TrainerConfig
    from tests.test_device_label_gather import build_dataset

    PI = ProteInferConfig(output_channels=32, kernel_size=5,
                          num_resnet_blocks=2, num_labels=8)
    PN = ProtNoteConfig(protein_embedding_dim=32, label_embedding_dim=16,
                        latent_dim=16, projection_head_num_layers=2,
                        projection_head_hidden_dim_scale_factor=2,
                        output_mlp_num_layers=2,
                        output_mlp_hidden_dim_scale_factor=2, label_tile=8)
    pi_p, pi_s = init_proteinfer(jax.random.PRNGKey(0), PI)
    pn_p, pn_s = init_protnote(jax.random.PRNGKey(1), PN)
    tx = make_optimizer({"OPTIMIZER": "Adam", "LEARNING_RATE": 1e-3})
    loss_fn = get_loss_fn({"LOSS_FN": "BCE"})
    tr = Trainer(init_train_state(pn_p, pn_s, pi_p, pi_s, tx),
                 PI, PN, loss_fn, tx, TrainerConfig())
    ds = build_dataset(rng)
    b = BucketBatcher(ds, 4, buckets=(64,), return_label_multihots=False)
    with pytest.raises(ValueError, match="zero batches"):
        tr.evaluate(b, threshold_sweep=np.linspace(0.1, 0.9, 5))
