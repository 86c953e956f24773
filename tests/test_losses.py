"""Loss numerics vs torch references (torch is CPU-only here, used purely as
an oracle — mirrors the formulas in protnote/utils/losses.py)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from protnote_tpu.train.losses import (
    batch_label_weighted_bce,
    batch_weighted_bce,
    bce_with_logits,
    cb_loss,
    focal_loss,
    get_loss_fn,
    rgd_bce,
    supcon_loss,
    weighted_bce,
)


@pytest.fixture
def data(rng):
    logits = rng.normal(size=(6, 40)).astype(np.float32) * 3
    targets = (rng.random((6, 40)) < 0.1).astype(np.float32)
    targets[0, 0] = 1  # ensure at least one positive
    return logits, targets


def torch_focal(logits, targets, alpha, gamma, smoothing=0.0):
    t = torch.tensor(targets)
    x = torch.tensor(logits)
    if smoothing > 0:
        t = t * (1 - smoothing) + (1 - t) * smoothing
    bce = F.binary_cross_entropy_with_logits(x, t, reduction="none")
    pt = torch.exp(-bce)
    loss = ((1 - pt) ** gamma) * bce
    if alpha >= 0:
        at = alpha * t + (1 - alpha) * (1 - t)
        loss = at * loss
    return loss.mean().item()


@pytest.mark.parametrize("alpha,gamma,smooth", [(-1, 2, 0.0), (0.25, 2, 0.0), (-1, 0, 0.1)])
def test_focal_loss_matches_torch(data, alpha, gamma, smooth):
    logits, targets = data
    ours = float(focal_loss(jnp.array(logits), jnp.array(targets),
                            alpha=alpha, gamma=gamma, label_smoothing=smooth))
    ref = torch_focal(logits, targets, alpha, gamma, smooth)
    assert abs(ours - ref) < 1e-5


def test_bce_pos_weight_matches_torch(data):
    logits, targets = data
    pw = 7.5
    ours = float(bce_with_logits(jnp.array(logits), jnp.array(targets), pos_weight=pw))
    ref = F.binary_cross_entropy_with_logits(
        torch.tensor(logits), torch.tensor(targets),
        pos_weight=torch.tensor(pw),
    ).item()
    assert abs(ours - ref) < 1e-5


def test_weighted_bce_matches_torch(data, rng):
    logits, targets = data
    lw = rng.random(40).astype(np.float32)
    ours = float(weighted_bce(jnp.array(logits), jnp.array(targets), jnp.array(lw)))
    w = (torch.tensor(lw) * torch.tensor(targets)).sum(dim=1, keepdim=True).expand(-1, 40)
    ref = F.binary_cross_entropy_with_logits(
        torch.tensor(logits), torch.tensor(targets), weight=w
    ).item()
    assert abs(ours - ref) < 1e-5


def test_batch_weighted_bce_matches_torch(data):
    logits, targets = data
    ours = float(batch_weighted_bce(jnp.array(logits), jnp.array(targets)))
    t = torch.tensor(targets)
    np_ = t.sum() + 1e-10
    nn = t.numel() - np_ + 1e-10
    tot = np_ + nn
    w = t * ((1 / np_) * (tot / 2)) + (1 - t) * ((1 / nn) * (tot / 2))
    ref = F.binary_cross_entropy_with_logits(torch.tensor(logits), t, weight=w).item()
    assert abs(ours - ref) < 1e-5


def test_batch_label_weighted_bce_matches_torch(data):
    logits, targets = data
    ours = float(batch_label_weighted_bce(jnp.array(logits), jnp.array(targets)))
    t = torch.tensor(targets)
    total = t.sum() + 1e-10
    freq = t.sum(axis=0) / total
    freq = torch.where(freq == 0, torch.ones_like(freq), 1 / freq)
    w = freq / freq.sum()
    ref = F.binary_cross_entropy_with_logits(
        torch.tensor(logits), t, weight=w.unsqueeze(0)
    ).item()
    assert abs(ours - ref) < 1e-5


def test_rgdbce_matches_torch(data):
    """The reference passes legacy ``reduce="none"`` to
    binary_cross_entropy_with_logits, which torch resolves to
    reduction='mean' — so the reweighting factor applies to the SCALAR mean
    BCE (verified against the imported reference module in
    test_reference_parity.py::test_rgd_bce_parity)."""
    logits, targets = data
    temp = 0.12
    ours = float(rgd_bce(jnp.array(logits), jnp.array(targets), temp))
    loss = F.binary_cross_entropy_with_logits(
        torch.tensor(logits), torch.tensor(targets)
    )
    ref = (loss * torch.exp(torch.clamp(loss.detach(), max=temp) / (temp + 1))).mean().item()
    assert abs(ours - ref) < 1e-5


def test_supcon_matches_torch(data):
    logits, targets = data
    targets = targets.copy()
    targets[targets.sum(axis=1) == 0, 0] = 1  # every row needs a positive
    ours = float(supcon_loss(jnp.array(logits), jnp.array(targets)))
    x = torch.tensor(logits)
    t = torch.tensor(targets)
    mx, _ = torch.max(x, dim=1, keepdim=True)
    sh = x - mx.detach()
    logprob = sh - torch.log(torch.exp(sh).sum(1, keepdim=True))
    mlpp = (t * logprob).sum(1) / t.sum(1)
    ref = (-torch.nan_to_num(mlpp, 0).mean()).item()
    assert abs(ours - ref) < 1e-5


def test_masked_mean_ignores_padding(data):
    logits, targets = data
    mask = np.ones_like(targets)
    mask[-2:] = 0
    ours = float(focal_loss(jnp.array(logits), jnp.array(targets), mask=jnp.array(mask)))
    ref = float(focal_loss(jnp.array(logits[:-2]), jnp.array(targets[:-2])))
    assert abs(ours - ref) < 1e-6


def test_loss_factory(data):
    logits, targets = data
    for name in ["BCE", "FocalLoss", "BatchWeightedBCE", "BatchLabelWeightedBCE", "RGDBCE"]:
        fn = get_loss_fn({"LOSS_FN": name, "RGDBCE_TEMP": 0.12,
                          "FOCAL_LOSS_GAMMA": 2, "FOCAL_LOSS_ALPHA": -1})
        v = float(fn(jnp.array(logits), jnp.array(targets)))
        assert np.isfinite(v)


def test_sgd_matches_torch_semantics():
    """make_optimizer('SGD') follows torch.optim.SGD as the reference uses
    it (_set_optimizer, ProtNoteTrainer.py:239-244): NO momentum, L2 weight
    decay folded into the gradient inside the step (after clipping).  A 0.9
    momentum default silently diverged here until round 4."""
    import jax.numpy as jnp
    import numpy as np
    import torch

    from protnote_tpu.train.optim import make_optimizer

    w0 = np.array([0.5, -1.2, 2.0], np.float32)
    g = np.array([0.3, -0.1, 0.05], np.float32)
    lr, wd = 0.1, 0.01

    tp = torch.nn.Parameter(torch.tensor(w0))
    opt = torch.optim.SGD([tp], lr=lr, weight_decay=wd)
    for _ in range(3):
        opt.zero_grad()
        tp.grad = torch.tensor(g)
        opt.step()

    tx = make_optimizer({"OPTIMIZER": "SGD", "LEARNING_RATE": lr,
                         "WEIGHT_DECAY": wd})
    params = {"w": jnp.asarray(w0)}
    state = tx.init(params)
    for _ in range(3):
        updates, state = tx.update({"w": jnp.asarray(g)}, state, params)
        params = {"w": params["w"] + updates["w"]}
    np.testing.assert_allclose(np.asarray(params["w"]),
                               tp.detach().numpy(), rtol=1e-6)
