"""Optimizer-update parity: our optax chain vs the reference's torch calls.

The train-loop oracle (tests/test_reference_train_parity.py) proves the SGD
trajectory end-to-end; Adam's end-to-end weights are chaotic by construction
(its first step is ~lr*sign(grad), so float-noise gradient differences flip
whole updates wherever the true gradient is ~0).  This test therefore pins
the UPDATE RULE itself deterministically: identical parameters and identical
gradient sequences are fed to torch.optim.{Adam,AdamW,SGD} with
clip_grad_norm_ + gradient accumulation exactly as the reference steps them
(ProtNoteTrainer.py:199-245, 728-755) and to our ``make_optimizer`` chain
(train/optim.py) — updates must match to float tolerance at every step.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from protnote_tpu.train.optim import make_optimizer

STEPS = 12
SHAPES = {"a": (7, 5), "b": (5,), "c": (3, 2)}


def _grad_sequence(seed, accum):
    rng = np.random.default_rng(seed)
    # include tiny-magnitude components: the regime where Adam's sign
    # sensitivity lives — identical inputs must still match exactly
    scale = {"a": 1.0, "b": 1e-6, "c": 10.0}
    return [
        {k: (rng.normal(size=s) * scale[k]).astype(np.float32)
         for k, s in SHAPES.items()}
        for _ in range(STEPS * accum)
    ]


def _init_params(seed):
    rng = np.random.default_rng(seed)
    return {k: rng.normal(size=s).astype(np.float32) for k, s in SHAPES.items()}


def _torch_run(name, params0, grads, lr, wd, clip, accum):
    params = {k: torch.nn.Parameter(torch.from_numpy(v.copy()))
              for k, v in params0.items()}
    plist = [params[k] for k in sorted(params)]
    if name == "Adam":
        opt = torch.optim.Adam(plist, lr=lr)
    elif name == "AdamW":
        opt = torch.optim.AdamW(plist, lr=lr, weight_decay=wd)
    else:
        opt = torch.optim.SGD(plist, lr=lr, weight_decay=wd)
    out = []
    for i, g in enumerate(grads):
        # the reference backward accumulates grads of loss/accum
        for k in params:
            gt = torch.from_numpy(g[k]) / accum
            params[k].grad = gt if params[k].grad is None else params[k].grad + gt
        if (i + 1) % accum == 0:
            if clip is not None:
                torch.nn.utils.clip_grad_norm_(plist, max_norm=clip)
            opt.step()
            opt.zero_grad()
            out.append({k: v.detach().numpy().copy() for k, v in params.items()})
    return out


def _ours_run(name, params0, grads, lr, wd, clip, accum):
    tx = make_optimizer({
        "OPTIMIZER": name, "LEARNING_RATE": lr, "WEIGHT_DECAY": wd,
        "CLIP_VALUE": clip, "GRADIENT_ACCUMULATION_STEPS": accum,
    })
    params = {k: jnp.asarray(v) for k, v in params0.items()}
    state = tx.init(params)
    out = []
    for i, g in enumerate(grads):
        gj = {k: jnp.asarray(v) for k, v in g.items()}
        updates, state = tx.update(gj, state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        if (i + 1) % accum == 0:
            out.append({k: np.asarray(v) for k, v in params.items()})
    return out


@pytest.mark.parametrize("name,wd,clip,accum", [
    ("Adam", 0.0, None, 1),
    ("Adam", 0.0, 0.5, 1),     # clip binds: grad norms are O(10)
    ("Adam", 0.0, 0.5, 3),     # clip on the ACCUMULATED gradient
    ("AdamW", 0.01, 0.5, 2),
    ("SGD", 0.0, None, 1),
    ("SGD", 0.1, 0.5, 2),      # L2 folded into the grad AFTER clipping
])
def test_update_rule_parity(name, wd, clip, accum):
    lr = 3e-3
    params0 = _init_params(0)
    grads = _grad_sequence(1, accum)
    ref = _torch_run(name, params0, grads, lr, wd, clip, accum)
    ours = _ours_run(name, params0, grads, lr, wd, clip, accum)
    assert len(ref) == len(ours) == STEPS
    for step, (r, o) in enumerate(zip(ref, ours)):
        for k in SHAPES:
            np.testing.assert_allclose(
                o[k], r[k], rtol=2e-6, atol=2e-7,
                err_msg=f"{name} step {step} param {k}",
            )


def test_clip_actually_bound():
    """Guard against a vacuous clip test: with CLIP_VALUE=0.5 the synthetic
    gradient global norm must exceed the max_norm."""
    grads = _grad_sequence(1, 1)
    norms = [float(np.sqrt(sum((g[k] ** 2).sum() for k in g))) for g in grads]
    assert min(norms) > 0.5
