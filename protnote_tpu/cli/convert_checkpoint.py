"""Checkpoint conversion CLI.

- reference torch ``.pt`` (ProtNote DDP checkpoints, models.py:304-374) ->
  our ``.ckpt`` so published seed-replicate weights drop in;
- reference TF1 ProteInfer pickles -> our encoder checkpoint.

Usage:
  python -m protnote_tpu.cli.convert_checkpoint protnote \
      --input seed_replicates_v9_12_sum_last_epoch.pt --output seed12.ckpt
  python -m protnote_tpu.cli.convert_checkpoint proteinfer \
      --input GO_model_weights13703706.pkl --output proteinfer_go.ckpt
"""

from __future__ import annotations

import argparse
import logging

logger = logging.getLogger(__name__)


def main(argv=None):
    import jax

    from protnote_tpu.core.checkpoint import save_checkpoint
    from protnote_tpu.core.config import DEFAULT_CONFIG_PATH, load_config, override_config
    from protnote_tpu.models.convert import (
        load_reference_checkpoint,
        proteinfer_from_tf_pickle,
    )
    from protnote_tpu.models.fusion import ProtNoteConfig
    from protnote_tpu.models.proteinfer import ProteInferConfig, init_proteinfer
    from protnote_tpu.train.optim import make_optimizer
    from protnote_tpu.train.step import init_train_state

    ap = argparse.ArgumentParser()
    ap.add_argument("kind", choices=["protnote", "proteinfer"])
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--config", default=str(DEFAULT_CONFIG_PATH))
    ap.add_argument("--override", nargs="*", default=None)
    ap.add_argument("--input-channels", type=int, default=None,
                    help="one-hot width of the runtime model; cli/main.py "
                         "uses max(INPUT_CHANNELS, len(amino-acid vocab)), "
                         "so pass the runtime value when the dataset carries "
                         "nonstandard residues (B/O/U/X/Z)")
    args = ap.parse_args(argv)

    logging.basicConfig(level=logging.INFO)
    cfg = override_config(load_config(args.config), args.override)
    params_cfg = cfg["params"]
    esp = cfg["embed_sequences_params"]
    pi_cfg = ProteInferConfig(
        input_channels=args.input_channels or esp.get("INPUT_CHANNELS", 20),
        output_channels=esp.get("OUTPUT_CHANNELS", 1100),
        kernel_size=esp.get("KERNEL_SIZE", 9),
        dilation_base=esp.get("DILATION_BASE", 3),
        num_resnet_blocks=esp.get("NUM_RESNET_BLOCKS", 5),
        bottleneck_factor=esp.get("BOTTLENECK_FACTOR", 0.5),
        num_labels=esp.get("PROTEINFER_NUM_GO_LABELS", 32102),
    )

    if args.kind == "proteinfer":
        params, state = proteinfer_from_tf_pickle(args.input, pi_cfg)
        save_checkpoint(args.output, {"params": params, "state": state}, epoch=0,
                        extra={"source": args.input, "kind": "proteinfer"})
        logger.info("wrote %s", args.output)
        return

    pn_cfg = ProtNoteConfig.from_params(
        params_cfg, protein_embedding_dim=pi_cfg.output_channels
    )
    pn_params, pn_state, encoder, meta = load_reference_checkpoint(
        args.input, pn_cfg, pi_cfg
    )
    if encoder is not None:
        enc_params, enc_state = encoder
    else:
        logger.warning("checkpoint has no sequence_encoder; random encoder init")
        enc_params, enc_state = init_proteinfer(jax.random.PRNGKey(0), pi_cfg)
    tx = make_optimizer(params_cfg)
    ts = init_train_state(pn_params, pn_state, enc_params, enc_state, tx)
    save_checkpoint(args.output, ts, epoch=meta.get("epoch") or 0,
                    best_val_metric=meta.get("best_val_metric"),
                    extra={"source": args.input, "kind": "protnote"})
    logger.info("wrote %s (epoch=%s best=%s)", args.output, meta.get("epoch"),
                meta.get("best_val_metric"))


if __name__ == "__main__":
    main()
