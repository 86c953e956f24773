"""Serve a trained ProtNote model over HTTP (production inference).

``python -m protnote_tpu.cli.serve --model-file ckpt --port 8000``

Loads the label-embedding cache + checkpoint once, precomputes the full
label-latent matrix, optionally compiles every bucket shape up front
(--warmup), then serves:

    POST /v1/predict  {"sequences": ["MKVL..."], "top_k": 10}
    GET  /healthz

Concurrent requests micro-batch into shared device dispatches (up to
--max-batch sequences / --max-wait-ms).  ``--override
'PAIR_BACKEND=tiled_int8'`` serves the int8 static-scale path (234 seqs/s
end-to-end on a v5e-1 vs 138.8 bf16; scales calibrate on the first batch).

The reference has no serving story — its inference entry points are batch
eval drivers (bin/main.py, Results.ipynb); this CLI plus
protnote_tpu/serving.py is the deployment surface they lack.
"""

from __future__ import annotations

import argparse
import logging

logger = logging.getLogger(__name__)


def build_engine(args):
    """Config + cache + checkpoint -> ServingEngine (model plumbing shared
    with cli/predict.py via cli/_model_setup.py)."""
    from protnote_tpu.cli._model_setup import (
        build_inference_model,
        resolve_label_mesh,
    )
    from protnote_tpu.core.config import DEFAULT_CONFIG_PATH, get_setup
    from protnote_tpu.data.label_cache import LabelEmbeddingCache, LabelEmbeddingView
    from protnote_tpu.serving import ServingEngine

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
    label_matrix = view.embeddings[view.first_k_rows(k)]

    mesh = resolve_label_mesh(args.mesh_label, params, log)
    pi_cfg, pn_cfg, trainer = build_inference_model(
        config, params, paths, cache, run_name, args.model_file, mesh, log,
    )

    engine = ServingEngine(
        trainer.ts, pi_cfg, trainer.pn_cfg, label_matrix, vocab,
        buckets=tuple(params.get("SEQUENCE_BUCKETS", (256, 512, 1024, 2048, 4096))),
        max_batch=args.max_batch or params.get("TEST_BATCH_SIZE", 32),
        mesh=mesh,
    )
    if args.calibration_fasta:
        # int8 scales from REAL sequences (warmup refuses to calibrate on
        # its synthetic motif; see ServingEngine.calibrate_from)
        from protnote_tpu.data.fasta import read_fasta

        seqs = [r[0] for r in read_fasta(args.calibration_fasta)]
        if not seqs:
            raise ValueError(f"{args.calibration_fasta}: no sequences")
        engine.calibrate_from(seqs)
    return engine, trainer


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
                    help="label-shard the model over the first N devices "
                         "(default: all devices when more than one; 1 "
                         "forces single-device)")
    ap.add_argument("--calibration-fasta", default=None,
                    help="real sequences for int8 activation-scale "
                         "calibration at startup (required for --warmup "
                         "with PAIR_BACKEND=tiled_int8 and no "
                         "INT8_ACT_SCALES)")
    ap.add_argument("--warmup", action="store_true",
                    help="compile every bucket shape before accepting traffic")
    return ap


def main(argv=None):
    from protnote_tpu.core.platform import honor_jax_platforms_env

    honor_jax_platforms_env()
    from protnote_tpu.serving import make_http_server

    logging.basicConfig(level=logging.INFO)
    args = build_argparser().parse_args(argv)
    engine, trainer = build_engine(args)
    if args.warmup:
        engine.warmup()

    def reload_fn(path: str) -> None:
        # checksum-verified restore into the trainer's template, then an
        # atomic (ts, latents) swap — in-flight requests finish on the old
        # weights
        trainer.load(path)
        engine.reload(trainer.ts)

    server, batcher = make_http_server(
        engine, port=args.port, host=args.host, max_wait_ms=args.max_wait_ms,
        reload_fn=reload_fn,
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
