"""Serve a trained ProtNote model over HTTP (production inference).

``python -m protnote_tpu.cli.serve --model-file ckpt --port 8000``

Loads the label-embedding cache + checkpoint once, precomputes the full
label-latent matrix, optionally compiles every bucket shape up front
(--warmup), then serves:

    POST /v1/predict  {"sequences": ["MKVL..."], "top_k": 10}
    GET  /healthz

Concurrent requests micro-batch into shared device dispatches (up to
--max-batch sequences / --max-wait-ms).  ``--override
'PAIR_BACKEND=tiled_int8'`` serves the int8 static-scale path (242 seqs/s
end-to-end on a v5e-1 vs 138.6 bf16; scales calibrate on the first batch).

The reference has no serving story — its inference entry points are batch
eval drivers (bin/main.py, Results.ipynb); this CLI plus
protnote_tpu/serving.py is the deployment surface they lack.
"""

from __future__ import annotations

import argparse
import logging
import os

logger = logging.getLogger(__name__)


def build_engine(args):
    """Config + cache + checkpoint -> ServingEngine (same model plumbing as
    cli/predict.py, without the dataset/batcher machinery)."""
    import jax
    import jax.numpy as jnp

    from protnote_tpu.core.config import DEFAULT_CONFIG_PATH, get_setup
    from protnote_tpu.data.label_cache import LabelEmbeddingCache, LabelEmbeddingView
    from protnote_tpu.models.convert import proteinfer_from_tf_pickle
    from protnote_tpu.models.fusion import ProtNoteConfig, init_protnote
    from protnote_tpu.models.proteinfer import ProteInferConfig, init_proteinfer
    from protnote_tpu.serving import ServingEngine
    from protnote_tpu.train.optim import make_optimizer
    from protnote_tpu.train.step import init_train_state
    from protnote_tpu.train.trainer import Trainer, TrainerConfig

    config, run_name, log = get_setup(
        config_path=args.config or DEFAULT_CONFIG_PATH,
        run_name=args.name, overrides=args.override,
        annotations_path_name=args.annotations_path_name,
        base_label_embedding_name=args.base_label_embedding_name,
    )
    params = config["params"]
    paths = config["paths_resolved"]

    cache = LabelEmbeddingCache.load(
        config["LABEL_EMBEDDING_PATH"], config["LABEL_EMBEDDING_INDEX_PATH"]
    )
    vocab = sorted(set(cache.ids))
    k = len(params.get("INFERENCE_GO_DESCRIPTIONS", "name+label").split("+"))
    view = LabelEmbeddingView.build(
        cache, vocab,
        params.get("INFERENCE_GO_DESCRIPTIONS", "name+label").split("+"),
    )
    rows = view.first_k_rows(k)
    label_matrix = view.embeddings[rows]

    esp = config.get("embed_sequences_params", {})
    pi_cfg = ProteInferConfig(
        input_channels=esp.get("INPUT_CHANNELS", 20),
        output_channels=esp.get("OUTPUT_CHANNELS", 1100),
        kernel_size=esp.get("KERNEL_SIZE", 9),
        dilation_base=esp.get("DILATION_BASE", 3),
        num_resnet_blocks=esp.get("NUM_RESNET_BLOCKS", 5),
        bottleneck_factor=esp.get("BOTTLENECK_FACTOR", 0.5),
        num_labels=esp.get("PROTEINFER_NUM_GO_LABELS", 32102),
    )
    pn_cfg = ProtNoteConfig.from_params(
        params, protein_embedding_dim=pi_cfg.output_channels,
        label_embedding_dim=cache.dim,
        inference_descriptions_per_label=k,
        label_tile=params.get("LABEL_TILE_SIZE", 512),
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
    if args.model_file:
        # Trainer.load handles template merge + device commit + checksum
        tr = Trainer(ts, pi_cfg, pn_cfg, loss_fn=None, tx=tx,
                     config=TrainerConfig.from_params(params, run_name=run_name))
        tr.load(args.model_file)
        ts = tr.ts

    mesh = None
    mesh_label = args.mesh_label or params.get("MESH_LABEL", 1)
    if len(jax.devices()) > 1:
        # pod serving: label axis sharded across all chips (predict.py
        # layout) unless --mesh-label pins a smaller extent
        from protnote_tpu.parallel.mesh import MeshSpec, make_mesh

        mesh_label = mesh_label if mesh_label > 1 else len(jax.devices())
        mesh = make_mesh(MeshSpec(dp=1, label=mesh_label))
        log.info("serving over a label-sharded mesh of %d devices", mesh_label)

    return ServingEngine(
        ts, pi_cfg, pn_cfg, label_matrix, vocab,
        buckets=tuple(params.get("SEQUENCE_BUCKETS", (256, 512, 1024, 2048, 4096))),
        max_batch=args.max_batch or params.get("TEST_BATCH_SIZE", 32),
        mesh=mesh,
    )


def build_argparser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model-file", default=None)
    ap.add_argument("--config", default=None)
    ap.add_argument("--name", default="serve")
    ap.add_argument("--override", nargs="*", default=None)
    ap.add_argument("--annotations-path-name", default="GO_ANNOTATIONS_PATH")
    ap.add_argument("--base-label-embedding-name",
                    default="GO_BASE_LABEL_EMBEDDING_PATH")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--max-batch", type=int, default=None)
    ap.add_argument("--max-wait-ms", type=float, default=5.0)
    ap.add_argument("--mesh-label", type=int, default=None,
                    help="label-shard the model over this many devices "
                         "(default: all devices when more than one)")
    ap.add_argument("--warmup", action="store_true",
                    help="compile every bucket shape before accepting traffic")
    return ap


def main(argv=None):
    from protnote_tpu.serving import make_http_server

    logging.basicConfig(level=logging.INFO)
    args = build_argparser().parse_args(argv)
    engine = build_engine(args)
    if args.warmup:
        engine.warmup()
    server, batcher = make_http_server(
        engine, port=args.port, host=args.host, max_wait_ms=args.max_wait_ms
    )
    logger.info("serving %d labels on http://%s:%d (backend=%s)",
                len(engine.label_vocabulary), args.host, args.port,
                engine.pn_cfg.pair_backend)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        batcher.close()
        server.server_close()


if __name__ == "__main__":
    main()
