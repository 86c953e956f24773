"""Shared inference-model construction for cli/predict.py and cli/serve.py.

One place builds the (ProteInferConfig, ProtNoteConfig, Trainer) triple from
a resolved config + label-embedding cache + optional checkpoint, and one
place resolves the label-sharded serving mesh — previously duplicated, which
let the --mesh-label devices bug exist twice (requesting fewer devices than
the host has crashed MeshSpec.resolve because make_mesh was always handed
ALL devices)."""

from __future__ import annotations

import os
from typing import Optional, Tuple


def resolve_label_tile(params: dict) -> int:
    """Label tile size for the pair-scoring kernel.

    The TPU-native knob is LABEL_TILE_SIZE.  The reference's equivalent
    inference lever is LABEL_BATCH_SIZE_LIMIT_NO_GRAD (the no-grad label
    chunk size — a MEMORY CAP, base_config.yaml:23); existing ``--override``
    command lines setting it keep working: when LABEL_TILE_SIZE is left at
    its default and the legacy key is set, its value is honored rounded
    DOWN to a multiple of 128 (MXU lane width — sub-128 tiles waste the
    systolic array), so the user's memory cap is respected.  Values below
    128 clamp up to one MXU tile, the smallest chunk the kernel can run —
    its footprint is far below what a 50-label torch chunk cost the
    reference anyway.
    """
    tile = params.get("LABEL_TILE_SIZE", 512)
    legacy = params.get("LABEL_BATCH_SIZE_LIMIT_NO_GRAD")
    if legacy and tile == 512:
        tile = max(128, (int(legacy) // 128) * 128)
    return int(tile)


def resolve_label_mesh(mesh_label_arg: Optional[int], params: dict, log):
    """(dp=1, label=N) mesh over the FIRST N devices, or None.

    ``mesh_label_arg``: explicit --mesh-label (1 forces single-device even
    on a multi-device host); None defers to params["MESH_LABEL"], then to
    all devices when more than one is attached."""
    import jax

    n = len(jax.devices())
    ml = mesh_label_arg if mesh_label_arg is not None else (
        params.get("MESH_LABEL", 0) or 0
    )
    if ml == 0:
        ml = n if n > 1 else 1
    if ml <= 1:
        return None
    if ml > n:
        raise ValueError(f"--mesh-label {ml} > {n} attached devices")
    from protnote_tpu.parallel.mesh import MeshSpec, make_mesh

    mesh = make_mesh(MeshSpec(dp=1, label=ml), devices=jax.devices()[:ml])
    log.info("label-sharded mesh over %d device(s)", ml)
    return mesh


def build_inference_model(
    config: dict, params: dict, paths: dict, cache, run_name: str,
    model_file: Optional[str], mesh, log, loss_fn=None,
) -> Tuple:
    """-> (pi_cfg, pn_cfg, trainer): full-size configs from the resolved
    config sections, ProteInfer weights from the TF pickle when present
    (random init otherwise), ProtNote from the checkpoint when given
    (restored through Trainer.load: template merge + checksum + device
    commit)."""
    import jax
    import jax.numpy as jnp

    from protnote_tpu.models.convert import proteinfer_from_tf_pickle
    from protnote_tpu.models.fusion import ProtNoteConfig, init_protnote
    from protnote_tpu.models.proteinfer import ProteInferConfig, init_proteinfer
    from protnote_tpu.train.optim import make_optimizer
    from protnote_tpu.train.step import init_train_state
    from protnote_tpu.train.trainer import Trainer, TrainerConfig

    esp = config.get("embed_sequences_params", {})
    pi_cfg = ProteInferConfig(
        input_channels=esp.get("INPUT_CHANNELS", 20),
        output_channels=esp.get("OUTPUT_CHANNELS", 1100),
        kernel_size=esp.get("KERNEL_SIZE", 9),
        dilation_base=esp.get("DILATION_BASE", 3),
        num_resnet_blocks=esp.get("NUM_RESNET_BLOCKS", 5),
        bottleneck_factor=esp.get("BOTTLENECK_FACTOR", 0.5),
        num_labels=esp.get("PROTEINFER_NUM_GO_LABELS", 32102),
        # reference autocasts the encoder unconditionally
        # (ProtNoteTrainer.py:287,728); MIXED_PRECISION=False keeps the
        # strict-f32 (Precision.HIGHEST) parity path
        compute_dtype=(
            jnp.bfloat16 if params.get("MIXED_PRECISION", True) else None
        ),
    )
    pn_cfg = ProtNoteConfig.from_params(
        params, protein_embedding_dim=pi_cfg.output_channels,
        label_embedding_dim=cache.dim,
        inference_descriptions_per_label=len(
            params.get("INFERENCE_GO_DESCRIPTIONS", "name+label").split("+")
        ),
        label_tile=resolve_label_tile(params),
        compute_dtype=(
            jnp.bfloat16 if params.get("MIXED_PRECISION", True)
            else jnp.float32
        ),
    )
    pi_weights = paths.get("PROTEINFER_GO_WEIGHTS_PATH")
    if pi_weights and os.path.exists(pi_weights):
        pi_params, pi_state = proteinfer_from_tf_pickle(pi_weights, pi_cfg)
    else:
        log.warning("ProteInfer weights unavailable; random init")
        pi_params, pi_state = init_proteinfer(jax.random.PRNGKey(0), pi_cfg)
    pn_params, pn_state = init_protnote(jax.random.PRNGKey(1), pn_cfg)
    tx = make_optimizer(params)
    ts = init_train_state(pn_params, pn_state, pi_params, pi_state, tx)

    tcfg = TrainerConfig.from_params(params, run_name=run_name)
    trainer = Trainer(ts, pi_cfg, pn_cfg, loss_fn=loss_fn, tx=tx, config=tcfg,
                      encoder_bn_train_mode=params.get(
                          "ENCODER_BN_TRAIN_MODE", False),
                      mesh=mesh)
    if model_file:
        trainer.load(model_file)
    return pi_cfg, pn_cfg, trainer
