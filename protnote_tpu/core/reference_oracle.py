"""Import the reference's own torch modules as parity oracles.

Used by ``tests/test_reference_parity.py`` and by
``cli/check_parity.py --reference-code``: instead of hand-built torch oracles
that could share this repo's misreading of the reference, the actual
reference package (default ``/root/reference``) is imported directly — torch
is installed — and logits / losses / BN statistics are compared on random
transplanted weights.  This retires the hand-built-oracle risk with zero
external artifacts (round-2 verdict item 1).

The reference imports a few packages that are absent here and irrelevant to
numerics (``blosum``, ``Bio``, ``wget``, ``pynvml``, ``loralib``) — those get
inert attribute stubs.  The one *load-bearing* stub is
``torchvision.ops.MLP`` (the reference's projection heads,
ProtNote.py:63-86): reproduced following the public torchvision.ops.misc.MLP
layout (per hidden dim: Linear -> norm -> activation -> Dropout, then a final
Linear + Dropout, ``bias`` applied to every Linear) so the Sequential indices
— and therefore the state_dict key paths that
``protnote_tpu.models.convert`` consumes — match reference checkpoints.
"""

from __future__ import annotations

import sys
import types
from typing import Dict

DEFAULT_REFERENCE_ROOT = "/root/reference"
REFERENCE_ROOT = DEFAULT_REFERENCE_ROOT  # back-compat alias


def _torchvision_mlp_cls():
    import torch

    class MLP(torch.nn.Sequential):
        """torchvision.ops.misc.MLP, reproduced for state_dict-layout parity."""

        def __init__(
            self,
            in_channels,
            hidden_channels,
            norm_layer=None,
            activation_layer=torch.nn.ReLU,
            inplace=None,
            bias=True,
            dropout=0.0,
        ):
            params = {} if inplace is None else {"inplace": inplace}
            layers = []
            in_dim = in_channels
            for hidden_dim in hidden_channels[:-1]:
                layers.append(torch.nn.Linear(in_dim, hidden_dim, bias=bias))
                if norm_layer is not None:
                    layers.append(norm_layer(hidden_dim))
                layers.append(activation_layer(**params))
                layers.append(torch.nn.Dropout(dropout, **params))
                in_dim = hidden_dim
            layers.append(torch.nn.Linear(in_dim, hidden_channels[-1], bias=bias))
            layers.append(torch.nn.Dropout(dropout, **params))
            super().__init__(*layers)

    return MLP


def _module(name, **attrs):
    import importlib.machinery

    mod = types.ModuleType(name)
    mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
    for k, v in attrs.items():
        setattr(mod, k, v)
    return mod


def _ensure(name, **attrs):
    if name not in sys.modules:
        sys.modules[name] = _module(name, **attrs)
    return sys.modules[name]


def install_reference_stubs(reference_root: str = DEFAULT_REFERENCE_ROOT) -> None:
    """Register import stubs, idempotently, and put the reference on sys.path."""
    import torch

    if reference_root not in sys.path:
        sys.path.insert(0, reference_root)

    # transformers sniffs for torchvision via find_spec at import time;
    # import it before the stub exists so the stub never confuses it.
    import transformers  # noqa: F401

    tv = _ensure("torchvision")
    ops = _ensure("torchvision.ops", MLP=_torchvision_mlp_cls())
    tv.ops = ops

    def _unavailable(*a, **k):
        raise RuntimeError("stubbed reference dependency used in parity check")

    _ensure("blosum", BLOSUM=_unavailable)

    class _LoraLinear(torch.nn.Linear):
        def __init__(self, in_features, out_features, r=0, lora_alpha=1, **kw):
            super().__init__(in_features, out_features)

    _ensure(
        "loralib",
        Linear=_LoraLinear,
        mark_only_lora_as_trainable=_unavailable,
        lora_state_dict=_unavailable,
    )

    bio = _ensure("Bio")
    seqio = _ensure("Bio.SeqIO", parse=_unavailable)
    expasy_enzyme = _ensure("Bio.ExPASy.Enzyme", parse=_unavailable)
    expasy = _ensure("Bio.ExPASy", Enzyme=expasy_enzyme)
    seq_mod = _ensure("Bio.Seq", Seq=_unavailable)
    rec_mod = _ensure("Bio.SeqRecord", SeqRecord=_unavailable)
    bio.SeqIO = seqio
    bio.ExPASy = expasy
    bio.Seq = seq_mod
    bio.SeqRecord = rec_mod

    _ensure("wget", download=_unavailable)
    _ensure(
        "pynvml",
        nvmlInit=_unavailable,
        nvmlDeviceGetHandleByIndex=_unavailable,
        nvmlDeviceGetMemoryInfo=_unavailable,
    )
    _ensure("obonet", read_obo=_unavailable)


def load_reference_modules(reference_root: str = DEFAULT_REFERENCE_ROOT):
    """Install stubs and return (protein_encoders, ProtNote module, losses)."""
    install_reference_stubs(reference_root)
    from protnote.models import protein_encoders  # reference import
    from protnote.models import ProtNote as protnote_module
    from protnote.utils import losses as ref_losses

    return protein_encoders, protnote_module, ref_losses


def randomize_bn_running_stats(model, seed: int = 0) -> None:
    """Give every BatchNorm non-trivial running stats so the eval path is a
    real test (fresh init has mean=0/var=1 which hides transpose bugs)."""
    import torch

    g = torch.Generator().manual_seed(seed)
    for m in model.modules():
        if isinstance(m, torch.nn.modules.batchnorm._BatchNorm):
            m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=g) * 0.5)
            m.running_var.copy_(torch.rand(m.running_var.shape, generator=g) * 1.5 + 0.25)


# ----------------------------------------------------------------------
# runtime checks for cli/check_parity.py --reference-code


def run_reference_code_checks(reference_root: str = DEFAULT_REFERENCE_ROOT,
                              tol: float = 1e-4) -> Dict:
    """Random-weight parity vs the imported reference modules.

    Compact runtime version of tests/test_reference_parity.py: ProteInfer
    eval + train-BN, every fusion variant in eval mode, the default train
    path, and the loss zoo.  Returns a results dict for PARITY_RESULTS.json.
    """
    import numpy as np
    import torch

    import jax
    import jax.numpy as jnp

    from protnote_tpu.models.convert import (
        proteinfer_from_torch_state_dict,
        protnote_from_torch_state_dict,
    )
    from protnote_tpu.models.fusion import ProtNoteConfig, protnote_forward
    from protnote_tpu.models.proteinfer import ProteInferConfig, proteinfer_embed
    from protnote_tpu.train import losses as my_losses

    pe_mod, pn_mod, ref_losses = load_reference_modules(reference_root)
    results: Dict = {}

    def record(name, maxdiff):
        results[name] = {
            "max_abs_diff": float(maxdiff),
            "status": "PASS" if maxdiff <= tol else "FAIL",
        }

    # --- ProteInfer encoder (eval + train BN) ---
    torch.manual_seed(0)
    model = pe_mod.ProteInfer(
        num_labels=13, input_channels=20, output_channels=64, kernel_size=9,
        activation=torch.nn.ReLU, dilation_base=3, num_resnet_blocks=3,
        bottleneck_factor=0.5,
    )
    randomize_bn_running_stats(model, 1)
    cfg = ProteInferConfig(input_channels=20, output_channels=64, kernel_size=9,
                           dilation_base=3, num_resnet_blocks=3,
                           bottleneck_factor=0.5, num_labels=13)
    params, state = proteinfer_from_torch_state_dict(model.state_dict(), cfg)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(3, 20, 30)).astype(np.float32)
    lengths = np.array([30, 1, 15], np.int64)
    for i, ln in enumerate(lengths):
        x[i, :, ln:] = 0.0
    model.eval()
    with torch.no_grad():
        ref_emb = model.get_embeddings(torch.from_numpy(x), torch.from_numpy(lengths)).numpy()
    emb, _ = proteinfer_embed(params, state, jnp.asarray(np.transpose(x, (0, 2, 1))),
                              jnp.asarray(lengths), cfg)
    record("proteinfer_eval", np.max(np.abs(np.asarray(emb) - ref_emb)))

    model.train()
    ref_emb_t = model.get_embeddings(torch.from_numpy(x), torch.from_numpy(lengths)).detach().numpy()
    _, expected_state = proteinfer_from_torch_state_dict(model.state_dict(), cfg)
    emb_t, new_state = proteinfer_embed(params, state,
                                        jnp.asarray(np.transpose(x, (0, 2, 1))),
                                        jnp.asarray(lengths), cfg, train=True)
    d = np.max(np.abs(np.asarray(emb_t) - ref_emb_t))
    for a, b in zip(jax.tree_util.tree_leaves(new_state),
                    jax.tree_util.tree_leaves(expected_state)):
        d = max(d, float(np.max(np.abs(np.asarray(a) - np.asarray(b)))))
    record("proteinfer_train_bn", d)

    # --- fusion variants, eval ---
    for fusion in ("concatenation", "concatenation_diff", "concatenation_prod",
                   "similarity"):
        torch.manual_seed(3)
        pmod = pn_mod.ProtNote(
            protein_embedding_dim=48, label_embedding_dim=40, latent_dim=32,
            projection_head_num_layers=4, projection_head_hidden_dim_scale_factor=3,
            output_mlp_num_layers=3, output_mlp_hidden_dim_scale_factor=3,
            outout_mlp_add_batchnorm=True, feature_fusion=fusion,
        )
        randomize_bn_running_stats(pmod, 4)
        pn_cfg = ProtNoteConfig(
            protein_embedding_dim=48, label_embedding_dim=40, latent_dim=32,
            feature_fusion=fusion,
        )
        p, s, _ = protnote_from_torch_state_dict(pmod.state_dict(), pn_cfg)
        P = rng.normal(size=(3, 48)).astype(np.float32)
        Lf = rng.normal(size=(5, 40)).astype(np.float32)
        pmod.eval()
        with torch.no_grad():
            ref_lg, _ = pmod(sequence_embeddings=torch.from_numpy(P),
                             label_embeddings=torch.from_numpy(Lf))
        lg, _ = protnote_forward(p, s, jnp.asarray(P), jnp.asarray(Lf), pn_cfg)
        record(f"fusion_eval_{fusion}", np.max(np.abs(np.asarray(lg) - ref_lg.numpy())))

        # default train path (decomposed for concat/diff, dense otherwise)
        pmod.train()
        ref_lg_t, _ = pmod(sequence_embeddings=torch.from_numpy(P),
                           label_embeddings=torch.from_numpy(Lf))
        _, exp_s, _ = protnote_from_torch_state_dict(pmod.state_dict(), pn_cfg)
        lg_t, new_s = protnote_forward(p, s, jnp.asarray(P), jnp.asarray(Lf), pn_cfg,
                                       train=True, rng=jax.random.PRNGKey(0))
        d = np.max(np.abs(np.asarray(lg_t) - ref_lg_t.detach().numpy()))
        for a, b in zip(jax.tree_util.tree_leaves(new_s),
                        jax.tree_util.tree_leaves(exp_s)):
            d = max(d, float(np.max(np.abs(np.asarray(a) - np.asarray(b)))))
        record(f"fusion_train_{fusion}", d)

    # --- loss zoo ---
    logits = rng.normal(size=(4, 7)).astype(np.float32) * 2
    targets = (rng.random((4, 7)) > 0.6).astype(np.float32)
    lt, tt = torch.from_numpy(logits), torch.from_numpy(targets)
    lj, tj = jnp.asarray(logits), jnp.asarray(targets)
    w = np.abs(rng.normal(size=(7,))).astype(np.float32) + 0.1
    pairs = {
        "FocalLoss": (
            ref_losses.FocalLoss(alpha=0.25, gamma=2.0)(lt, tt),
            my_losses.focal_loss(lj, tj, alpha=0.25, gamma=2.0),
        ),
        "BCE": (
            torch.nn.BCEWithLogitsLoss()(lt, tt),
            my_losses.bce_with_logits(lj, tj),
        ),
        "WeightedBCE": (
            ref_losses.WeightedBCE(torch.from_numpy(w))(lt, tt),
            my_losses.weighted_bce(lj, tj, jnp.asarray(w)),
        ),
        "CBLoss": (
            ref_losses.CBLoss(torch.from_numpy(w * 10))(lt, tt),
            my_losses.cb_loss(lj, tj, jnp.asarray(w * 10)),
        ),
        "BatchWeightedBCE": (
            ref_losses.BatchWeightedBCE()(lt, tt),
            my_losses.batch_weighted_bce(lj, tj),
        ),
        "BatchLabelWeightedBCE": (
            ref_losses.BatchLabelWeightedBCE()(lt, tt),
            my_losses.batch_label_weighted_bce(lj, tj),
        ),
        "RGDBCE": (
            ref_losses.RGDBCE(temperature=2.0)(lt, tt),
            my_losses.rgd_bce(lj, tj, temperature=2.0),
        ),
        "SupCon": (
            ref_losses.SupCon(temperature=0.07)(lt, tt),
            my_losses.supcon_loss(lj, tj),
        ),
    }
    d = max(abs(float(r) - float(m)) for r, m in pairs.values())
    record("loss_zoo", d)
    return results
