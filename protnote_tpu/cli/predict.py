"""Pod-scale batched inference (BASELINE.json config[4]): score every
sequence of a (possibly unlabeled) FASTA against the full label vocabulary,
label axis sharded across the mesh, streaming float16 logits to sharded
parquet files so the full-SwissProt output (~570k x 32k) never lives in
memory at once."""

from __future__ import annotations

import argparse
import json
import logging
import os
import time

import numpy as np

logger = logging.getLogger(__name__)


def main(argv=None):
    from protnote_tpu.core.platform import honor_jax_platforms_env

    honor_jax_platforms_env()
    import jax

    from protnote_tpu.core.config import DEFAULT_CONFIG_PATH, get_setup
    from protnote_tpu.data.batching import BucketBatcher
    from protnote_tpu.data.dataset import DatasetConfig, ProteinDataset
    from protnote_tpu.data.label_cache import LabelEmbeddingCache

    ap = argparse.ArgumentParser()
    ap.add_argument("--fasta", required=True, help="input sequences (labels optional)")
    ap.add_argument("--model-file", default=None)
    ap.add_argument("--config", default=None)
    ap.add_argument("--name", default="predict")
    ap.add_argument("--override", nargs="*", default=None)
    ap.add_argument("--annotations-path-name", default="GO_ANNOTATIONS_PATH")
    ap.add_argument("--base-label-embedding-name", default="GO_BASE_LABEL_EMBEDDING_PATH")
    ap.add_argument("--output-dir", default=None)
    ap.add_argument("--rows-per-shard", type=int, default=10000)
    ap.add_argument("--batch-size", type=int, default=None)
    ap.add_argument("--mesh-label", type=int, default=None)
    # multi-host slice execution (reference multi-node env:// rendezvous,
    # bin/main.py:185-200); each process writes its own logit-column shards
    ap.add_argument("--distributed", action="store_true")
    ap.add_argument("--coordinator-address", default=None)
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--process-id", type=int, default=None)
    args = ap.parse_args(argv)

    from protnote_tpu.parallel.distributed import initialize_distributed

    initialize_distributed(
        args.coordinator_address, args.num_processes, args.process_id,
        force=args.distributed,
    )

    logging.basicConfig(level=logging.INFO)
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
    # full label vocabulary = every distinct id in the cache
    vocab = sorted(set(cache.ids))
    ds = ProteinDataset(
        args.fasta, DatasetConfig.from_params(params, "test"),
        label_embedding_cache=cache,
        vocabularies={
            "amino_acid_vocab": sorted("ACDEFGHIKLMNPQRSTVWY"),
            "label_vocab": vocab,
            "sequence_id_vocab": [],
        },
    )
    log.info("%d sequences x %d labels", len(ds), ds.num_labels)

    from protnote_tpu.cli._model_setup import (
        build_inference_model,
        resolve_label_mesh,
    )

    mesh = resolve_label_mesh(args.mesh_label, params, log)
    pi_cfg, pn_cfg, trainer = build_inference_model(
        config, params, paths, cache, run_name, args.model_file, mesh, log,
    )

    batcher = BucketBatcher(
        ds, args.batch_size or params.get("TEST_BATCH_SIZE", 32),
        buckets=tuple(params.get("SEQUENCE_BUCKETS", (256, 512, 1024, 2048, 4096))),
        tokens_per_batch=params.get("TOKENS_PER_BATCH"),
        label_pad_multiple=mesh.shape["label"] if mesh is not None else 1,
        descriptions_per_label=pn_cfg.inference_descriptions_per_label,
        return_label_multihots=False,
        device_label_gather=bool(
            params.get("DEVICE_RESIDENT_LABEL_EMBEDDINGS", True)
        ),
    )
    label_matrix = trainer._label_matrix_for(ds)
    prefetch_n = int(params.get("PREFETCH_BATCHES", 2) or 0)
    if prefetch_n > 0:
        from protnote_tpu.data.batching import PrefetchBatcher

        batcher = PrefetchBatcher(batcher, prefetch=prefetch_n)

    out_dir = args.output_dir or paths.get("RESULTS_DIR", "outputs/results")
    os.makedirs(out_dir, exist_ok=True)
    import pandas as pd

    from protnote_tpu.train.step import batch_to_device_dict

    multi = jax.process_count() > 1
    proc_sfx = f"_p{jax.process_index():03d}" if multi else ""
    local_cols = None  # full-vocab column ids this process owns

    def read_local(x):
        """Logits readback that works when the array spans multiple hosts:
        each process extracts the column blocks its devices own (mesh is
        (dp=1, label=N) here, so every shard holds all rows)."""
        nonlocal local_cols
        if not multi:
            if local_cols is None:
                local_cols = np.arange(x.shape[1])
            return np.asarray(x)
        blocks = {}
        for s in x.addressable_shards:
            c0 = s.index[1].start or 0
            blocks.setdefault(c0, np.asarray(s.data))
        order = sorted(blocks)
        if local_cols is None:
            local_cols = np.concatenate(
                [np.arange(c, c + blocks[c].shape[1]) for c in order]
            )
        return np.concatenate([blocks[c] for c in order], axis=1)

    shard_rows, shard_ids, shard_no, written = [], [], 0, 0
    # int8 serving: calibrate static activation scales from the first batch
    # unless INT8_ACT_SCALES were supplied (INT8_CALIBRATE=False opts out)
    trainer.ensure_int8_calibrated(batcher)
    latents = None
    latents_ok = trainer._latents_eligible(batcher)
    t0 = time.perf_counter()

    def flush():
        nonlocal shard_rows, shard_ids, shard_no
        if not shard_rows:
            return
        cols = [vocab[c] for c in col_vocab_ids]
        df = pd.DataFrame(
            np.concatenate(shard_rows).astype(np.float32), columns=cols,
            index=shard_ids,
        )
        path = os.path.join(
            out_dir, f"predict_logits_{run_name}{proc_sfx}_{shard_no:05d}.parquet"
        )
        df.to_parquet(path)
        logger.info("wrote %s (%d rows x %d labels)", path, len(df), len(cols))
        shard_rows, shard_ids = [], []
        shard_no += 1

    col_vocab_ids = None
    for batch in batcher:
        arrays = trainer._place(batch_to_device_dict(batch), batch,
                                label_matrix=label_matrix)
        if latents_ok and "label_rows" in arrays:
            if latents is None:  # eval label layout is batch-invariant
                latents = trainer._label_latents(arrays)
            arrays = trainer._swap_in_latents(arrays, latents)
        out = trainer._eval_step(trainer.ts, arrays)
        logits = read_local(out["logits"])
        keep = batch.example_mask
        logits = logits[keep]
        if col_vocab_ids is None:
            # drop padded label columns; map local columns to vocab ids
            valid = (
                batch.label_mask[local_cols]
                if batch.label_mask is not None
                else np.ones(len(local_cols), bool)
            )
            col_keep = np.where(valid)[0]
            col_vocab_ids = local_cols[col_keep]
        logits = logits[:, col_keep]
        shard_rows.append(logits.astype(np.float16))
        shard_ids.extend([s for s, k in zip(batch.sequence_ids, keep) if k])
        written += int(keep.sum())
        if sum(len(x) for x in shard_rows) >= args.rows_per_shard:
            flush()
    flush()
    dt = time.perf_counter() - t0
    log.info("scored %d sequences in %.1fs (%.1f seqs/s, %.3g pair-scores/s)",
             written, dt, written / dt, written * ds.num_labels / dt)
    print(json.dumps({"sequences": written, "labels": ds.num_labels,
                      "seconds": round(dt, 1), "seqs_per_sec": round(written / dt, 2)}))


if __name__ == "__main__":
    main()
