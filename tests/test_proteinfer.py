"""Golden tests: the JAX ProteInfer encoder vs a torch oracle.

The oracle is assembled from torch.nn.functional primitives following the
architecture spec (masked dilated convs, BN eps=1e-3, ResNet-v2 bottlenecks,
masked mean pool) so our XLA implementation is checked against torch's conv /
batchnorm numerics on identical weights.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from protnote_tpu.models.proteinfer import (
    ProteInferConfig,
    embed_from_ids,
    init_proteinfer,
    one_hot_sequences,
    proteinfer_embed,
    proteinfer_forward,
)

CFG = ProteInferConfig(
    input_channels=20,
    output_channels=64,
    kernel_size=9,
    dilation_base=3,
    num_resnet_blocks=3,
    bottleneck_factor=0.5,
    num_labels=17,
)


def torch_masked_conv(x, w, b, lengths, dilation):
    # x: (B, C, T); zero padding before and after conv
    B, C, T = x.shape
    mask = (torch.arange(T)[None, :] < lengths[:, None]).float()[:, None, :]
    x = x * mask
    pad = dilation * (w.shape[-1] - 1) // 2
    y = F.conv1d(x, w, b, padding=pad, dilation=dilation)
    return y * mask


def torch_bn_eval(x, scale, bias, mean, var, eps=1e-3):
    # x: (B, C, T)
    inv = scale / torch.sqrt(var + eps)
    return x * inv[None, :, None] + (bias - mean * inv)[None, :, None]


def torch_oracle(params, state, onehot_bt_c, lengths):
    x = torch.tensor(onehot_bt_c).permute(0, 2, 1)  # (B, C, T)
    lengths_t = torch.tensor(lengths)

    def t(a):
        return torch.tensor(np.asarray(a))

    w1 = t(params["conv1"]["kernel"]).permute(2, 1, 0)  # (out,in,k)
    feats = torch_masked_conv(x, w1, t(params["conv1"]["bias"]), lengths_t, 1)
    for i, (bp, bs) in enumerate(zip(params["blocks"], state["blocks"])):
        out = torch_bn_eval(feats, t(bp["bn1"]["scale"]), t(bp["bn1"]["bias"]),
                            t(bs["bn1"]["mean"]), t(bs["bn1"]["var"]))
        out = F.relu(out)
        out = torch_masked_conv(out, t(bp["conv_dilated"]["kernel"]).permute(2, 1, 0),
                                t(bp["conv_dilated"]["bias"]), lengths_t, 3 ** i)
        out = torch_bn_eval(out, t(bp["bn2"]["scale"]), t(bp["bn2"]["bias"]),
                            t(bs["bn2"]["mean"]), t(bs["bn2"]["var"]))
        out = F.relu(out)
        out = torch_masked_conv(out, t(bp["conv_1x1"]["kernel"]).permute(2, 1, 0),
                                t(bp["conv_1x1"]["bias"]), lengths_t, 1)
        feats = feats + out
    T = feats.shape[-1]
    mask = (torch.arange(T)[None, :] < lengths_t[:, None]).float()[:, None, :]
    feats = feats * mask
    pooled = feats.sum(dim=-1) / lengths_t[:, None].float()
    logits = pooled @ t(params["output"]["kernel"]) + t(params["output"]["bias"])
    return pooled.numpy(), logits.numpy()


@pytest.fixture(scope="module")
def model():
    params, state = init_proteinfer(jax.random.PRNGKey(1), CFG)
    # random running stats so BN eval is non-trivial
    k = jax.random.PRNGKey(2)
    new_blocks = []
    for bs in state["blocks"]:
        nb = {}
        for bn_name, bn in bs.items():
            k, k1, k2 = jax.random.split(k, 3)
            nb[bn_name] = {
                "mean": jax.random.normal(k1, bn["mean"].shape) * 0.3,
                "var": jax.random.uniform(k2, bn["var"].shape, minval=0.5, maxval=2.0),
            }
        new_blocks.append(nb)
    return params, {"blocks": new_blocks}


@pytest.fixture(scope="module")
def inputs(model):
    rng = np.random.default_rng(0)
    B, T = 4, 100
    lengths = np.array([100, 73, 40, 9], dtype=np.int32)
    aa_ids = rng.integers(0, 20, size=(B, T)).astype(np.int8)
    for b, l in enumerate(lengths):
        aa_ids[b, l:] = 20  # pad id
    onehot = np.asarray(one_hot_sequences(jnp.array(aa_ids), 20))
    return aa_ids, onehot, lengths


def test_embedding_matches_torch(model, inputs):
    params, state = model
    aa_ids, onehot, lengths = inputs
    emb, _ = proteinfer_embed(params, state, jnp.array(onehot), jnp.array(lengths), CFG)
    ref_emb, _ = torch_oracle(params, state, onehot, lengths)
    np.testing.assert_allclose(np.asarray(emb), ref_emb, rtol=2e-4, atol=2e-4)


def test_logits_match_torch(model, inputs):
    params, state = model
    aa_ids, onehot, lengths = inputs
    logits, _ = proteinfer_forward(params, state, jnp.array(onehot), jnp.array(lengths), CFG)
    _, ref_logits = torch_oracle(params, state, onehot, lengths)
    np.testing.assert_allclose(np.asarray(logits), ref_logits, rtol=2e-4, atol=2e-4)


def test_padding_invariance(model, inputs):
    """Extra padding must not change the embedding (masked convs + pool)."""
    params, state = model
    aa_ids, onehot, lengths = inputs
    emb1, _ = embed_from_ids(params, state, jnp.array(aa_ids), jnp.array(lengths), CFG)
    padded = np.full((aa_ids.shape[0], 160), 20, dtype=np.int8)
    padded[:, :100] = aa_ids
    emb2, _ = embed_from_ids(params, state, jnp.array(padded), jnp.array(lengths), CFG)
    np.testing.assert_allclose(np.asarray(emb1), np.asarray(emb2), rtol=1e-5, atol=1e-5)


def test_onehot_pad_id_is_zero_row():
    oh = np.asarray(one_hot_sequences(jnp.array([[0, 5, 20]]), 20))
    assert oh[0, 0, 0] == 1 and oh[0, 1, 5] == 1
    assert oh[0, 2].sum() == 0


def test_train_mode_updates_bn_state(model, inputs):
    params, state = model
    _, onehot, lengths = inputs
    _, new_state = proteinfer_embed(
        params, state, jnp.array(onehot), jnp.array(lengths), CFG, train=True
    )
    before = np.asarray(state["blocks"][0]["bn1"]["mean"])
    after = np.asarray(new_state["blocks"][0]["bn1"]["mean"])
    assert not np.allclose(before, after)
