"""Embedding-similarity zero-shot baseline driver (reference
bin/run_baseline.py:138-157): map each unseen label to its nearest trained
label by cosine similarity of frozen text embeddings and reuse the supervised
model's logits for that column."""

from __future__ import annotations

import argparse
import logging

import numpy as np

from protnote_tpu.baselines.similarity import transfer_logits
from protnote_tpu.core.config import (
    DEFAULT_CONFIG_PATH, label_embedding_index_path, load_config, resolve_paths,
)
from protnote_tpu.data.label_cache import LabelEmbeddingCache, LabelEmbeddingView
from protnote_tpu.evaln.results_io import load_logits, save_evaluation_results

logger = logging.getLogger(__name__)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=str(DEFAULT_CONFIG_PATH))
    ap.add_argument("--supervised-logits", required=True,
                    help="parquet/h5 of supervised logits over the trained vocab")
    ap.add_argument("--trained-cache", required=True,
                    help="label-embedding cache (.npz) for the trained vocab")
    ap.add_argument("--zero-shot-cache", required=True,
                    help="label-embedding cache (.npz) for the unseen labels")
    ap.add_argument("--zero-shot-vocab", nargs="*", default=None,
                    help="subset of unseen label ids (default: all in cache)")
    ap.add_argument("--output-dir", default="outputs/results")
    ap.add_argument("--run-name", default="similarity_baseline")
    ap.add_argument("--description-type", default="name")
    args = ap.parse_args(argv)

    logging.basicConfig(level=logging.INFO)

    sup = load_logits(args.supervised_logits)
    trained_vocab = list(sup.columns)

    trained_cache = LabelEmbeddingCache.load(args.trained_cache)
    zs_cache = LabelEmbeddingCache.load(args.zero_shot_cache)
    # `is None`, not truthiness: an explicitly-empty --zero-shot-vocab must
    # error out, not silently score the entire cache vocabulary
    if args.zero_shot_vocab is not None and not args.zero_shot_vocab:
        raise SystemExit("--zero-shot-vocab given but empty")
    zs_vocab = (
        args.zero_shot_vocab if args.zero_shot_vocab is not None
        else sorted(set(zs_cache.ids))
    )

    trained_view = LabelEmbeddingView.build(
        trained_cache, trained_vocab, [args.description_type]
    )
    zs_view = LabelEmbeddingView.build(zs_cache, zs_vocab, [args.description_type])
    trained_emb, _, _ = trained_view.first_k_per_label(1)
    zs_emb, _, _ = zs_view.first_k_per_label(1)

    out = transfer_logits(sup.values.astype(np.float32), zs_emb, trained_emb)
    paths = save_evaluation_results(
        {"logits": out, "sequence_ids": list(sup.index)},
        zs_vocab, args.run_name, args.output_dir, "zero_shot",
    )
    logger.info("similarity baseline written: %s", paths)


if __name__ == "__main__":
    main()
