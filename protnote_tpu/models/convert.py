"""Checkpoint conversion from reference formats.

Two sources (reference: protnote/utils/proteinfer.py:7-41 and
protnote/utils/models.py:304-374):

* **TF1 ProteInfer pickles** (``GO_model_weights*.pkl``): an ordered dict of
  TF variable arrays.  The reference zips them positionally onto the torch
  state_dict; here they are zipped positionally onto our parameter walk.  TF
  conv1d kernels are (k, in, out) and dense kernels (in, out) — exactly the
  JAX layout, so no transposition is needed (the reference's reverse-axis
  transpose exists only because torch stores (out, in, k)).
* **Torch ProtNote checkpoints** (``*.pt``): name-based mapping of the
  ``model_state_dict`` (optionally ``module.``-prefixed from DDP) onto our
  pytrees, transposing 2-D linear weights and (out,in,k) conv kernels.
"""

from __future__ import annotations

import pickle
import re
from collections import defaultdict
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from protnote_tpu.models.proteinfer import ProteInferConfig, init_proteinfer
from protnote_tpu.models.fusion import ProtNoteConfig, init_protnote


def sigmoid_bias_from_prob(prior_prob: float) -> float:
    return -float(np.log((1 - prior_prob) / prior_prob))


# ----------------------------------------------------------------------
# TF pickle -> ProteInfer params


def _proteinfer_slots(params: Dict, state: Dict) -> List[Tuple[Any, Any, str]]:
    """Ordered (container, key, kind) slots matching the reference's
    positional zip order (torch state_dict order minus num_batches buffers)."""
    slots: List[Tuple[Any, Any, str]] = [
        (params["conv1"], "kernel", "conv"),
        (params["conv1"], "bias", "vec"),
    ]
    for bp, bs in zip(params["blocks"], state["blocks"]):
        slots += [
            (bp["bn1"], "scale", "vec"),
            (bp["bn1"], "bias", "vec"),
            (bs["bn1"], "mean", "vec"),
            (bs["bn1"], "var", "vec"),
            (bp["conv_dilated"], "kernel", "conv"),
            (bp["conv_dilated"], "bias", "vec"),
            (bp["bn2"], "scale", "vec"),
            (bp["bn2"], "bias", "vec"),
            (bs["bn2"], "mean", "vec"),
            (bs["bn2"], "var", "vec"),
            (bp["conv_1x1"], "kernel", "conv"),
            (bp["conv_1x1"], "bias", "vec"),
        ]
    slots += [
        (params["output"], "kernel", "dense"),
        (params["output"], "bias", "vec"),
    ]
    return slots


def _order_tf_values_by_name(tf_weights: Dict[str, np.ndarray],
                             num_blocks: int) -> Optional[List[np.ndarray]]:
    """Order TF variables into slot order *by variable name*.

    The pickle keys are TF variable names (``inferrer/.../conv1d_3/kernel:0``
    etc., producer: /root/reference/bin/export_proteinfer.py:33-42).  Groups
    are classified by leaf (kernel/bias vs gamma/beta/moving_*) and kernel
    rank (conv1d = 3-D, dense = 2-D), then ordered by TF's auto-numbering
    suffix — removing the positional zip's reliance on dict insertion order
    (reference proteinfer.py:28-38 zips positionally).  Returns None when the
    names do not fit the expected schema (caller falls back to positional).
    """
    groups: Dict[str, Dict[str, np.ndarray]] = defaultdict(dict)
    for name, arr in tf_weights.items():
        parts = name.split("/")
        leaf = parts[-1].split(":")[0]
        scope = "/".join(parts[:-1])
        groups[scope][leaf] = np.asarray(arr)

    def scope_index(scope: str) -> int:
        m = re.search(r"_(\d+)$", scope.split("/")[-1])
        return int(m.group(1)) if m else 0

    convs, bns, denses = [], [], []
    for scope, g in groups.items():
        if {"gamma", "beta", "moving_mean", "moving_variance"} <= set(g):
            bns.append((scope_index(scope), g))
        elif "kernel" in g and g["kernel"].ndim == 3 and "bias" in g:
            convs.append((scope_index(scope), g))
        elif "kernel" in g and g["kernel"].ndim == 2 and "bias" in g:
            denses.append((scope_index(scope), g))
        else:
            return None  # unrecognised group
    if (
        len(convs) != 1 + 2 * num_blocks
        or len(bns) != 2 * num_blocks
        or len(denses) != 1
        or len({i for i, _ in convs}) != len(convs)
        or len({i for i, _ in bns}) != len(bns)
    ):
        return None
    convs = [g for _, g in sorted(convs)]
    bns = [g for _, g in sorted(bns)]
    dense = denses[0][1]

    # slot order (see _proteinfer_slots): conv1, then per block
    # [bn1 γβ, bn1 stats, conv_dilated, bn2 γβ, bn2 stats, conv_1x1], output
    values: List[np.ndarray] = [convs[0]["kernel"], convs[0]["bias"]]
    for i in range(num_blocks):
        bn1, bn2 = bns[2 * i], bns[2 * i + 1]
        cd, c1 = convs[1 + 2 * i], convs[2 + 2 * i]
        values += [
            bn1["gamma"], bn1["beta"], bn1["moving_mean"], bn1["moving_variance"],
            cd["kernel"], cd["bias"],
            bn2["gamma"], bn2["beta"], bn2["moving_mean"], bn2["moving_variance"],
            c1["kernel"], c1["bias"],
        ]
    values += [dense["kernel"], dense["bias"]]
    return values


def proteinfer_from_tf_pickle(weights_path: str, cfg: ProteInferConfig,
                              strategy: str = "auto"):
    """Load a reference TF1 pickle into (params, state) pytrees.

    ``strategy``: "name" (match TF variable names), "positional" (reference
    zip order), or "auto" (name-based with positional fallback)."""
    import jax
    import jax.numpy as jnp

    with open(weights_path, "rb") as fh:
        tf_weights = pickle.load(fh)
    tf_weights = dict(tf_weights)
    tf_weights = {k: v for k, v in tf_weights.items()
                  if not k.split("/")[-1].startswith("global_step")}

    params, state = init_proteinfer(jax.random.PRNGKey(0), cfg)
    slots = _proteinfer_slots(params, state)

    values = None
    if strategy in ("auto", "name"):
        values = _order_tf_values_by_name(tf_weights, cfg.num_resnet_blocks)
        if values is None and strategy == "name":
            raise ValueError(
                "TF pickle variable names do not match the expected "
                "ProteInfer schema; retry with strategy='positional'"
            )
    if values is None:
        values = list(tf_weights.values())
    if len(values) != len(slots):
        raise ValueError(
            f"TF pickle has {len(values)} arrays; expected {len(slots)}"
        )
    for (container, key, kind), arr in zip(slots, values):
        arr = np.asarray(arr)
        want = tuple(container[key].shape)
        if arr.shape != want:
            # Fall back to reversed-axis layout (e.g. torch-style dumps).
            if arr.ndim >= 2 and arr.transpose(tuple(reversed(range(arr.ndim)))).shape == want:
                arr = arr.transpose(tuple(reversed(range(arr.ndim))))
            else:
                raise ValueError(f"shape mismatch for {key}: {arr.shape} vs {want}")
        container[key] = jnp.asarray(arr, dtype=container[key].dtype)
    return params, state


# ----------------------------------------------------------------------
# torch state dict -> pytrees


def _strip_ddp(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    if sd and next(iter(sd)).startswith("module."):
        return {k[len("module."):]: v for k, v in sd.items()}
    return sd


def _to_numpy(v) -> np.ndarray:
    # Copy: .numpy() is a VIEW of torch storage, and jnp.asarray on the CPU
    # backend keeps it zero-copy — a later in-place torch mutation (e.g. a
    # train-mode BN running-stat update) would silently change the converted
    # pytree.  Caught by tests/test_reference_parity.py train-BN tests.
    if hasattr(v, "detach"):
        return np.array(v.detach().cpu().numpy())
    return np.asarray(v)


def _group_sequential(sd: Dict[str, np.ndarray], prefix: str):
    """Group a flat torch Sequential's entries by integer path.

    Returns an ordered list of {param_name: array} dicts, ordered by the
    (possibly nested) integer index path, robust to Dropout/ReLU gaps and to
    dropout-wrapper nesting (reference ProtNote.py:82-86).
    """
    groups: Dict[Tuple[int, ...], Dict[str, np.ndarray]] = defaultdict(dict)
    plen = len(prefix) + 1
    for key, val in sd.items():
        if not key.startswith(prefix + "."):
            continue
        parts = key[plen:].split(".")
        idx = tuple(int(p) for p in parts[:-1] if p.isdigit())
        groups[idx][parts[-1]] = _to_numpy(val)
    return [groups[k] for k in sorted(groups)]


def _classify(groups) -> Tuple[List[Dict], List[Dict]]:
    """Split sequential groups into (linears, batchnorms)."""
    linears, bns = [], []
    for g in groups:
        if "running_mean" in g:
            bns.append(g)
        elif "weight" in g and g["weight"].ndim == 2:
            linears.append(g)
    return linears, bns


def _assign_linear(dst: Dict, g: Dict) -> None:
    import jax.numpy as jnp

    dst["kernel"] = jnp.asarray(g["weight"].T, dtype=dst["kernel"].dtype)
    if "bias" in dst and "bias" in g:
        dst["bias"] = jnp.asarray(g["bias"], dtype=dst["bias"].dtype)


def _assign_bn(dst_p: Dict, dst_s: Dict, g: Dict) -> None:
    import jax.numpy as jnp

    dst_p["scale"] = jnp.asarray(g["weight"], dtype=dst_p["scale"].dtype)
    dst_p["bias"] = jnp.asarray(g["bias"], dtype=dst_p["bias"].dtype)
    dst_s["mean"] = jnp.asarray(g["running_mean"], dtype=dst_s["mean"].dtype)
    dst_s["var"] = jnp.asarray(g["running_var"], dtype=dst_s["var"].dtype)


def proteinfer_from_torch_state_dict(sd: Dict, cfg: ProteInferConfig):
    """Torch ProteInfer (reference protein_encoders.py:70-123) -> pytrees."""
    import jax
    import jax.numpy as jnp

    sd = _strip_ddp({k: _to_numpy(v) for k, v in sd.items()})
    params, state = init_proteinfer(jax.random.PRNGKey(0), cfg)

    def conv(dst, w, b):
        dst["kernel"] = jnp.asarray(np.transpose(w, (2, 1, 0)), dst["kernel"].dtype)
        dst["bias"] = jnp.asarray(b, dst["bias"].dtype)

    conv(params["conv1"], sd["conv1.weight"], sd["conv1.bias"])
    for i, (bp, bs) in enumerate(zip(params["blocks"], state["blocks"])):
        pre = f"resnet_blocks.{i}"
        _assign_bn(bp["bn1"], bs["bn1"], {
            "weight": sd[f"{pre}.bn_activation_1.0.weight"],
            "bias": sd[f"{pre}.bn_activation_1.0.bias"],
            "running_mean": sd[f"{pre}.bn_activation_1.0.running_mean"],
            "running_var": sd[f"{pre}.bn_activation_1.0.running_var"],
        })
        conv(bp["conv_dilated"], sd[f"{pre}.masked_conv1.weight"], sd[f"{pre}.masked_conv1.bias"])
        _assign_bn(bp["bn2"], bs["bn2"], {
            "weight": sd[f"{pre}.bn_activation_2.0.weight"],
            "bias": sd[f"{pre}.bn_activation_2.0.bias"],
            "running_mean": sd[f"{pre}.bn_activation_2.0.running_mean"],
            "running_var": sd[f"{pre}.bn_activation_2.0.running_var"],
        })
        conv(bp["conv_1x1"], sd[f"{pre}.masked_conv2.weight"], sd[f"{pre}.masked_conv2.bias"])
    _assign_linear(params["output"], {"weight": sd["output_layer.weight"],
                                      "bias": sd["output_layer.bias"]})
    return params, state


def protnote_from_torch_state_dict(sd: Dict, cfg: ProtNoteConfig,
                                   proteinfer_cfg: Optional[ProteInferConfig] = None):
    """Torch ProtNote checkpoint -> (params, state[, encoder params/state]).

    Maps W_p / W_l projection heads, output_layer MLP, optional attention
    scorer, and (when present) the embedded frozen sequence encoder.
    """
    import jax

    sd = _strip_ddp({k: _to_numpy(v) for k, v in sd.items()})
    params, state = init_protnote(jax.random.PRNGKey(0), cfg)

    for head in ("W_p", "W_l"):
        linears, bns = _classify(_group_sequential(sd, head))
        if len(linears) != len(params[head]["layers"]):
            raise ValueError(
                f"{head}: {len(linears)} linears in checkpoint vs "
                f"{len(params[head]['layers'])} expected"
            )
        for dst, g in zip(params[head]["layers"], linears):
            _assign_linear(dst, g)
        if len(bns) != len(params[head]["bns"]):
            # an unchecked zip would silently keep random-init BN params
            raise ValueError(
                f"{head}: {len(bns)} batchnorms in checkpoint vs "
                f"{len(params[head]['bns'])} expected"
            )
        for dst_p, dst_s, g in zip(params[head]["bns"], state[head]["bns"], bns):
            _assign_bn(dst_p, dst_s, g)

    if cfg.feature_fusion.startswith("concatenation"):
        linears, bns = _classify(_group_sequential(sd, "output_layer"))
        om_p = params["output_mlp"]
        om_s = state.get("output_mlp")
        if len(linears) != len(om_p["layers"]) + 1:
            raise ValueError(
                f"output_layer: {len(linears)} linears vs "
                f"{len(om_p['layers']) + 1} expected"
            )
        for dst, g in zip(om_p["layers"], linears[:-1]):
            _assign_linear(dst, g)
        _assign_linear(om_p["out"], linears[-1])
        if om_s is not None:
            if len(bns) != len(om_p["bns"]):
                raise ValueError(
                    f"output_layer: {len(bns)} batchnorms in checkpoint vs "
                    f"{len(om_p['bns'])} expected"
                )
            for dst_p, dst_s, g in zip(om_p["bns"], om_s["bns"], bns):
                _assign_bn(dst_p, dst_s, g)

    if "raw_attn_scorer.weight" in sd and "attn" in params:
        _assign_linear(params["attn"], {"weight": sd["raw_attn_scorer.weight"],
                                        "bias": sd["raw_attn_scorer.bias"]})

    encoder = None
    if proteinfer_cfg is not None and any(k.startswith("sequence_encoder.") for k in sd):
        enc_sd = {
            k[len("sequence_encoder."):]: v
            for k, v in sd.items()
            if k.startswith("sequence_encoder.")
        }
        encoder = proteinfer_from_torch_state_dict(enc_sd, proteinfer_cfg)
    return params, state, encoder


def load_reference_checkpoint(path: str, cfg: ProtNoteConfig,
                              proteinfer_cfg: Optional[ProteInferConfig] = None):
    """Load a reference ``.pt`` checkpoint file (torch.save format)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model_state_dict", ckpt)
    params, state, encoder = protnote_from_torch_state_dict(sd, cfg, proteinfer_cfg)
    meta = {
        "epoch": ckpt.get("epoch"),
        "best_val_metric": ckpt.get("best_val_metric"),
    }
    return params, state, encoder, meta
