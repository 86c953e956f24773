"""Pod-scale evaluation rehearsal on the virtual 8-device mesh (VERDICT r3
weak #4 / next-round #6): the BASELINE config[4] flagship eval is ~570k
sequences x 32k labels — the two scale regimes that never engaged in a full
loop are (a) the exact-mAP disk spool and (b) micro histogram totals beyond
int32 (the flagship test set already sits at 77% of wrap).  These tests run
the REAL eval loop (batcher -> sharded eval step on the dp x label mesh ->
accumulator -> finalize) in both regimes."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from protnote_tpu.data.batching import BucketBatcher
from protnote_tpu.evaln.metrics import DeviceEvalAccumulator, EvalMetrics
from protnote_tpu.models.fusion import ProtNoteConfig, init_protnote
from protnote_tpu.models.proteinfer import ProteInferConfig, init_proteinfer
from protnote_tpu.parallel.mesh import MeshSpec, make_mesh
from protnote_tpu.train.losses import get_loss_fn
from protnote_tpu.train.optim import make_optimizer
from protnote_tpu.train.step import init_train_state
from protnote_tpu.train.trainer import Trainer, TrainerConfig

from tests.test_device_label_gather import build_dataset

PI = ProteInferConfig(output_channels=32, kernel_size=5, num_resnet_blocks=2,
                      num_labels=8)
PN = ProtNoteConfig(protein_embedding_dim=32, label_embedding_dim=16,
                    latent_dim=16, projection_head_num_layers=2,
                    projection_head_hidden_dim_scale_factor=2,
                    output_mlp_num_layers=2,
                    output_mlp_hidden_dim_scale_factor=2, label_tile=8)


def _make_trainer(mesh, **cfg_kw):
    pi_p, pi_s = init_proteinfer(jax.random.PRNGKey(0), PI)
    pn_p, pn_s = init_protnote(jax.random.PRNGKey(1), PN)
    tx = make_optimizer({"OPTIMIZER": "Adam", "LEARNING_RATE": 1e-3})
    ts = init_train_state(pn_p, pn_s, pi_p, pi_s, tx)
    loss_fn = get_loss_fn({"LOSS_FN": "BCE"})
    return Trainer(ts, PI, PN, loss_fn, tx,
                   TrainerConfig(decision_threshold=0.5, **cfg_kw), mesh=mesh)


def test_spool_engages_in_full_sharded_eval_loop(rng):
    """trainer.evaluate on the dp=4 x label=2 mesh with the disk spool forced
    on (EVAL_SPILL_THRESHOLD_BYTES=1) produces BIT-IDENTICAL metrics to the
    default in-RAM run — the full-loop analogue of
    test_exact_auprc_spool_matches_in_ram."""
    ds = build_dataset(rng, n_seqs=48, n_labels=24)
    mesh = make_mesh(MeshSpec(dp=4, label=2))

    # capture the EvalMetrics instances trainer.evaluate constructs so the
    # test can assert the spool actually engaged
    import protnote_tpu.train.trainer as trainer_mod

    captured = []
    orig = trainer_mod.EvalMetrics

    class Capturing(orig):
        def __init__(self, *a, **kw):
            super().__init__(*a, **kw)
            captured.append(self)

    trainer_mod.EvalMetrics = Capturing
    try:
        b = BucketBatcher(ds, 8, buckets=(96,))
        m_spool = _make_trainer(
            mesh, eval_spill_threshold_bytes=1, eval_spill_tile_rows=16,
        ).evaluate(b)["metrics"]
        assert captured and captured[-1].auprc._spool is not None, \
            "spool path never engaged"
        m_ram = _make_trainer(mesh).evaluate(b)["metrics"]
        assert captured[-1].auprc._spool is None, "control run spilled"
    finally:
        trainer_mod.EvalMetrics = orig

    assert set(m_spool) == set(m_ram)
    for k in m_ram:
        if k in ("seqs_per_sec", "pairs_per_sec"):  # wall-clock meters
            continue
        if k == "map_micro":
            # in-RAM micro uses the exact full sort; the spooled run uses
            # the 2^20 logit-grid histogram.  At this tiny scale (1.2k
            # pairs clustered near p=0.5 by the random-weight model) grid
            # ties are relatively loud; micro precision itself is gated in
            # test_metrics.py — this test gates the SPOOL integration.
            assert m_spool[k] == pytest.approx(m_ram[k], abs=1e-3), k
            continue
        assert m_spool[k] == m_ram[k], (k, m_spool[k], m_ram[k])


def test_micro_wrap_regime_through_sharded_eval_loop(rng):
    """Device-accumulated eval where the micro histogram's label-axis sums
    cross int32: histograms preloaded with ~1e8 counts per (label, bin) —
    summing 2*24 labels x 1e8 over the label axis reaches ~4.8e9, past the
    2.1e9 int32 wrap the r3 fix addressed (metrics.py finalize: f32 sums).
    Real batches stream through the sharded eval step on top of the
    preload; finalize must match the int64 host oracle."""
    ds = build_dataset(rng, n_seqs=24, n_labels=24)
    mesh = make_mesh(MeshSpec(dp=4, label=2))
    trainer = _make_trainer(mesh)
    L = len(ds.label_vocabulary)

    acc = DeviceEvalAccumulator(L, threshold=0.5)
    nb = acc.num_bins
    preload_rng = np.random.default_rng(3)
    pre_pos = preload_rng.integers(5e7, 1.2e8, (L, nb)).astype(np.int64)
    pre_neg = preload_rng.integers(5e7, 1.2e8, (L, nb)).astype(np.int64)
    state = dict(acc.state)
    state["hist"] = jnp.asarray(
        np.concatenate([pre_pos, pre_neg], axis=0).reshape(-1), jnp.int32)
    acc.state = state
    assert int(np.sum(pre_pos[:, 0])) > np.iinfo(np.int32).max // 2

    # int64 host oracle with the same preload
    host = EvalMetrics(num_labels=L, threshold=0.5, map_estimate=True,
                       num_bins=nb)
    host.auprc.merge(pre_pos, pre_neg)

    from protnote_tpu.train.step import make_eval_step

    ev = make_eval_step(PI, PN)
    b = BucketBatcher(ds, 8, buckets=(96,))
    from protnote_tpu.train.step import batch_to_device_dict

    for batch in b:
        # the trainer's real mesh placement (dp-sharded rows, label-sharded
        # multihots, replicated the rest)
        arrays = trainer._place(batch_to_device_dict(batch), batch=batch)
        out = ev(trainer.ts, arrays)
        logits = out["logits"]
        targets = jnp.asarray(batch.label_multihots.astype(np.float32))
        emask = jnp.asarray(batch.example_mask.astype(np.float32))
        acc.update(logits, targets, emask)
        probs = 1.0 / (1.0 + np.exp(-np.asarray(logits, np.float32)))
        keep = batch.example_mask.astype(bool)
        host.update(probs[keep], batch.label_multihots[keep])

    target = EvalMetrics(num_labels=L, threshold=0.5, map_estimate=True,
                         num_bins=nb)
    acc.finalize_into(target)
    dm, hm = target.compute(), host.compute()
    # f32 device cumsum of ~5e9-scale totals: ~1e-7 relative error
    assert dm["map_micro"] == pytest.approx(hm["map_micro"], rel=1e-5)
    assert dm["map_macro"] == pytest.approx(hm["map_macro"], rel=1e-5)
    assert dm["map_micro"] > 0  # an int32 wrap drives the AP negative/NaN
