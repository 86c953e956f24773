"""Checkpoint converters: reference torch/TF layouts -> our pytrees."""

import pickle

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from protnote_tpu.models.convert import (
    proteinfer_from_tf_pickle,
    proteinfer_from_torch_state_dict,
    protnote_from_torch_state_dict,
)
from protnote_tpu.models.fusion import ProtNoteConfig
from protnote_tpu.models.proteinfer import ProteInferConfig

PI = ProteInferConfig(input_channels=4, output_channels=8, kernel_size=3,
                      dilation_base=3, num_resnet_blocks=2,
                      bottleneck_factor=0.5, num_labels=5)


def _rt(*shape):
    return torch.randn(*shape)


def _torch_proteinfer_sd():
    """State dict with the reference module names/shapes
    (protein_encoders.py:70-107)."""
    sd = {}
    sd["conv1.weight"] = _rt(8, 4, 3)  # (out, in, k)
    sd["conv1.bias"] = _rt(8)
    for i in range(2):
        p = f"resnet_blocks.{i}"
        sd[f"{p}.bn_activation_1.0.weight"] = _rt(8)
        sd[f"{p}.bn_activation_1.0.bias"] = _rt(8)
        sd[f"{p}.bn_activation_1.0.running_mean"] = _rt(8)
        sd[f"{p}.bn_activation_1.0.running_var"] = torch.rand(8) + 0.5
        sd[f"{p}.bn_activation_1.0.num_batches_tracked"] = torch.tensor(7)
        sd[f"{p}.masked_conv1.weight"] = _rt(4, 8, 3)
        sd[f"{p}.masked_conv1.bias"] = _rt(4)
        sd[f"{p}.bn_activation_2.0.weight"] = _rt(4)
        sd[f"{p}.bn_activation_2.0.bias"] = _rt(4)
        sd[f"{p}.bn_activation_2.0.running_mean"] = _rt(4)
        sd[f"{p}.bn_activation_2.0.running_var"] = torch.rand(4) + 0.5
        sd[f"{p}.bn_activation_2.0.num_batches_tracked"] = torch.tensor(7)
        sd[f"{p}.masked_conv2.weight"] = _rt(8, 4, 1)
        sd[f"{p}.masked_conv2.bias"] = _rt(8)
    sd["output_layer.weight"] = _rt(5, 8)
    sd["output_layer.bias"] = _rt(5)
    return sd


def test_proteinfer_torch_conversion():
    torch.manual_seed(0)
    sd = _torch_proteinfer_sd()
    params, state = proteinfer_from_torch_state_dict(sd, PI)
    np.testing.assert_allclose(
        np.asarray(params["conv1"]["kernel"]),
        sd["conv1.weight"].numpy().transpose(2, 1, 0),
    )
    np.testing.assert_allclose(
        np.asarray(params["blocks"][1]["conv_dilated"]["kernel"]),
        sd["resnet_blocks.1.masked_conv1.weight"].numpy().transpose(2, 1, 0),
    )
    np.testing.assert_allclose(
        np.asarray(state["blocks"][0]["bn1"]["var"]),
        sd["resnet_blocks.0.bn_activation_1.0.running_var"].numpy(),
    )
    np.testing.assert_allclose(
        np.asarray(params["output"]["kernel"]), sd["output_layer.weight"].numpy().T
    )
    # DDP "module." prefix handled
    sd2 = {"module." + k: v for k, v in sd.items()}
    params2, _ = proteinfer_from_torch_state_dict(sd2, PI)
    np.testing.assert_allclose(
        np.asarray(params2["conv1"]["bias"]), np.asarray(params["conv1"]["bias"])
    )


def test_proteinfer_tf_pickle_conversion(tmp_path):
    """TF stream order: per-module (gamma, beta, mean, var) + conv (k,in,out)
    kernels + dense (in,out), positional zip (reference proteinfer.py:7-41)."""
    rng = np.random.default_rng(0)
    entries = []
    entries.append(("inferrer/conv1/kernel:0", rng.normal(size=(3, 4, 8))))
    entries.append(("inferrer/conv1/bias:0", rng.normal(size=8)))
    for i in range(2):
        entries += [
            (f"b{i}/bn1/gamma:0", rng.normal(size=8)),
            (f"b{i}/bn1/beta:0", rng.normal(size=8)),
            (f"b{i}/bn1/moving_mean:0", rng.normal(size=8)),
            (f"b{i}/bn1/moving_variance:0", rng.random(8) + 0.5),
            (f"b{i}/convd/kernel:0", rng.normal(size=(3, 8, 4))),
            (f"b{i}/convd/bias:0", rng.normal(size=4)),
            (f"b{i}/bn2/gamma:0", rng.normal(size=4)),
            (f"b{i}/bn2/beta:0", rng.normal(size=4)),
            (f"b{i}/bn2/moving_mean:0", rng.normal(size=4)),
            (f"b{i}/bn2/moving_variance:0", rng.random(4) + 0.5),
            (f"b{i}/conv1x1/kernel:0", rng.normal(size=(1, 4, 8))),
            (f"b{i}/conv1x1/bias:0", rng.normal(size=8)),
        ]
    entries.append(("inferrer/dense/kernel:0", rng.normal(size=(8, 5))))
    entries.append(("inferrer/dense/bias:0", rng.normal(size=5)))
    d = dict(entries)
    d["inferrer/global_step:0"] = np.int64(1000)
    path = tmp_path / "w.pkl"
    with open(path, "wb") as fh:
        pickle.dump(d, fh)

    params, state = proteinfer_from_tf_pickle(str(path), PI)
    np.testing.assert_allclose(np.asarray(params["conv1"]["kernel"]),
                               d["inferrer/conv1/kernel:0"])
    np.testing.assert_allclose(np.asarray(state["blocks"][1]["bn2"]["mean"]),
                               d["b1/bn2/moving_mean:0"])
    np.testing.assert_allclose(np.asarray(params["output"]["kernel"]),
                               d["inferrer/dense/kernel:0"])

    # wrong array count -> hard error (drop a real weight, keep global_step)
    d2 = dict(entries[:-1])
    d2["inferrer/global_step:0"] = np.int64(1000)
    with open(tmp_path / "bad.pkl", "wb") as fh:
        pickle.dump(d2, fh)
    with pytest.raises(ValueError):
        proteinfer_from_tf_pickle(str(tmp_path / "bad.pkl"), PI)


def _torch_protnote_sd(cfg: ProtNoteConfig):
    """Reference ProtNote naming: torchvision-MLP Sequential indices for
    W_p/W_l (Linear,BN,ReLU,Dropout per hidden layer; ProtNote.py:63-86) and
    get_mlp indices for output_layer (ProtNote.py:337-378)."""
    sd = {}

    def head(prefix, in_dim):
        hidden = [cfg.latent_dim * cfg.projection_head_hidden_dim_scale_factor] * (
            cfg.projection_head_num_layers - 1
        ) + [cfg.latent_dim]
        idx = 0
        d = in_dim
        for li, h in enumerate(hidden):
            sd[f"{prefix}.{idx}.weight"] = _rt(h, d)
            idx += 1
            if li < len(hidden) - 1:
                sd[f"{prefix}.{idx}.weight"] = _rt(h)
                sd[f"{prefix}.{idx}.bias"] = _rt(h)
                sd[f"{prefix}.{idx}.running_mean"] = _rt(h)
                sd[f"{prefix}.{idx}.running_var"] = torch.rand(h) + 0.5
                sd[f"{prefix}.{idx}.num_batches_tracked"] = torch.tensor(3)
                idx += 3  # BN, ReLU, Dropout
            else:
                idx += 1  # trailing Dropout
            d = h

    head("W_p", cfg.protein_embedding_dim)
    head("W_l", cfg.label_embedding_dim)

    H = cfg.output_mlp_hidden_dim
    idx = 0
    d = cfg.joint_dim
    for li in range(cfg.output_mlp_num_layers):
        sd[f"output_layer.{idx}.weight"] = _rt(H, d)
        idx += 1
        sd[f"output_layer.{idx}.weight"] = _rt(H)
        sd[f"output_layer.{idx}.bias"] = _rt(H)
        sd[f"output_layer.{idx}.running_mean"] = _rt(H)
        sd[f"output_layer.{idx}.running_var"] = torch.rand(H) + 0.5
        sd[f"output_layer.{idx}.num_batches_tracked"] = torch.tensor(3)
        idx += 2  # BN, ReLU
        if li < cfg.output_mlp_num_layers - 1:
            idx += 1  # Dropout
        d = H
    sd[f"output_layer.{idx}.weight"] = _rt(1, H)
    sd[f"output_layer.{idx}.bias"] = _rt(1)
    return sd


def test_protnote_torch_conversion():
    torch.manual_seed(1)
    cfg = ProtNoteConfig(
        protein_embedding_dim=12, label_embedding_dim=10, latent_dim=6,
        projection_head_num_layers=3, projection_head_hidden_dim_scale_factor=2,
        output_mlp_num_layers=3, output_mlp_hidden_dim_scale_factor=2,
    )
    sd = _torch_protnote_sd(cfg)
    params, state, enc = protnote_from_torch_state_dict(sd, cfg)
    assert enc is None
    np.testing.assert_allclose(
        np.asarray(params["W_p"]["layers"][0]["kernel"]), sd["W_p.0.weight"].numpy().T
    )
    np.testing.assert_allclose(
        np.asarray(params["W_p"]["layers"][2]["kernel"]), sd["W_p.8.weight"].numpy().T
    )
    np.testing.assert_allclose(
        np.asarray(state["W_l"]["bns"][1]["var"]), sd["W_l.5.running_var"].numpy()
    )
    np.testing.assert_allclose(
        np.asarray(params["output_mlp"]["out"]["kernel"]),
        sd["output_layer.11.weight"].numpy().T,
    )
    np.testing.assert_allclose(
        np.asarray(state["output_mlp"]["bns"][2]["mean"]),
        sd["output_layer.9.running_mean"].numpy(),
    )


def test_proteinfer_tf_pickle_name_based(tmp_path):
    """Realistic TF variable names (inferrer/conv1d_N, batch_normalization_N,
    dense — the schema export_proteinfer.py:33-42 dumps) are matched BY NAME:
    a scrambled dict order must still convert correctly."""
    rng = np.random.default_rng(1)
    entries = [
        ("inferrer/conv1d/kernel:0", rng.normal(size=(3, 4, 8))),
        ("inferrer/conv1d/bias:0", rng.normal(size=8)),
        ("inferrer/dense/kernel:0", rng.normal(size=(8, 5))),
        ("inferrer/dense/bias:0", rng.normal(size=5)),
        ("inferrer/global_step:0", np.int64(1000)),
    ]
    # bn numbering 0..3 (TF drops the suffix on the first), conv numbering 1..4
    for i in range(2):
        bn1, bn2 = 2 * i, 2 * i + 1
        cd, c1 = 1 + 2 * i, 2 + 2 * i
        sfx1 = f"_{bn1}" if bn1 else ""
        entries += [
            (f"inferrer/batch_normalization{sfx1}/gamma:0", rng.normal(size=8)),
            (f"inferrer/batch_normalization{sfx1}/beta:0", rng.normal(size=8)),
            (f"inferrer/batch_normalization{sfx1}/moving_mean:0", rng.normal(size=8)),
            (f"inferrer/batch_normalization{sfx1}/moving_variance:0", rng.random(8) + 0.5),
            (f"inferrer/conv1d_{cd}/kernel:0", rng.normal(size=(3, 8, 4))),
            (f"inferrer/conv1d_{cd}/bias:0", rng.normal(size=4)),
            (f"inferrer/batch_normalization_{bn2}/gamma:0", rng.normal(size=4)),
            (f"inferrer/batch_normalization_{bn2}/beta:0", rng.normal(size=4)),
            (f"inferrer/batch_normalization_{bn2}/moving_mean:0", rng.normal(size=4)),
            (f"inferrer/batch_normalization_{bn2}/moving_variance:0", rng.random(4) + 0.5),
            (f"inferrer/conv1d_{c1}/kernel:0", rng.normal(size=(1, 4, 8))),
            (f"inferrer/conv1d_{c1}/bias:0", rng.normal(size=8)),
        ]
    d = dict(entries)
    # scramble insertion order — positional zip would mis-assign
    keys = list(d)
    rng.shuffle(keys)
    scrambled = {k: d[k] for k in keys}
    path = tmp_path / "scrambled.pkl"
    with open(path, "wb") as fh:
        pickle.dump(scrambled, fh)

    params, state = proteinfer_from_tf_pickle(str(path), PI)
    np.testing.assert_allclose(np.asarray(params["conv1"]["kernel"]),
                               d["inferrer/conv1d/kernel:0"])
    np.testing.assert_allclose(np.asarray(params["blocks"][0]["conv_dilated"]["kernel"]),
                               d["inferrer/conv1d_1/kernel:0"])
    np.testing.assert_allclose(np.asarray(params["blocks"][1]["conv_1x1"]["bias"]),
                               d["inferrer/conv1d_4/bias:0"])
    np.testing.assert_allclose(np.asarray(state["blocks"][1]["bn1"]["var"]),
                               d["inferrer/batch_normalization_2/moving_variance:0"])
    np.testing.assert_allclose(np.asarray(params["output"]["kernel"]),
                               d["inferrer/dense/kernel:0"])

    # strategy="name" on a nonconforming pickle raises
    bad = {f"x{i}/kernel:0": np.zeros((2, 2)) for i in range(3)}
    with open(tmp_path / "noname.pkl", "wb") as fh:
        pickle.dump(bad, fh)
    with pytest.raises(ValueError, match="schema"):
        proteinfer_from_tf_pickle(str(tmp_path / "noname.pkl"), PI, strategy="name")
