"""Standalone ProteInfer evaluation (reference bin/test_proteinfer.py):
score a test FASTA with the ProteInfer classifier head alone (no fusion
tower), optionally restricted/remapped to the labels represented in the
dataset (--only-represented-labels, reference :252-316) and optionally
GO-DAG-normalised, then report the usual metric suite and export logits."""

from __future__ import annotations

import argparse
import json
import logging
import os

import numpy as np

logger = logging.getLogger(__name__)


def main(argv=None):
    from protnote_tpu.core.platform import honor_jax_platforms_env

    honor_jax_platforms_env()
    import jax
    import jax.numpy as jnp

    from protnote_tpu.core.config import DEFAULT_CONFIG_PATH, load_config, override_config, resolve_paths
    from protnote_tpu.data.batching import BucketBatcher
    from protnote_tpu.data.dataset import DatasetConfig, ProteinDataset
    from protnote_tpu.data.vocab import generate_vocabularies
    from protnote_tpu.evaln.metrics import EvalMetrics
    from protnote_tpu.evaln.results_io import save_evaluation_results
    from protnote_tpu.models.convert import proteinfer_from_tf_pickle
    from protnote_tpu.models.proteinfer import (
        ProteInferConfig, init_proteinfer, one_hot_sequences, proteinfer_forward,
    )

    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=str(DEFAULT_CONFIG_PATH))
    ap.add_argument("--test-path-name", default="TEST_DATA_PATH")
    ap.add_argument("--weights-path-name", default="PROTEINFER_GO_WEIGHTS_PATH")
    ap.add_argument("--weights", default=None, help="explicit TF pickle path")
    ap.add_argument("--vocab-json", default=None,
                    help="JSON list: label order of the classifier head")
    ap.add_argument("--only-represented-labels", action="store_true")
    ap.add_argument("--normalize-probabilities", action="store_true")
    ap.add_argument("--parenthood-json", default=None)
    ap.add_argument("--threshold", type=float, default=0.5)
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--save-prediction-results", action="store_true")
    ap.add_argument("--output-dir", default=None)
    ap.add_argument("--name", default="proteinfer")
    ap.add_argument("--override", nargs="*", default=None)
    args = ap.parse_args(argv)

    logging.basicConfig(level=logging.INFO)
    cfg = resolve_paths(override_config(load_config(args.config), args.override))
    paths = cfg["paths_resolved"]
    esp = cfg["embed_sequences_params"]

    pi_cfg = ProteInferConfig(
        input_channels=esp.get("INPUT_CHANNELS", 20),
        output_channels=esp.get("OUTPUT_CHANNELS", 1100),
        kernel_size=esp.get("KERNEL_SIZE", 9),
        dilation_base=esp.get("DILATION_BASE", 3),
        num_resnet_blocks=esp.get("NUM_RESNET_BLOCKS", 5),
        bottleneck_factor=esp.get("BOTTLENECK_FACTOR", 0.5),
        num_labels=esp.get("PROTEINFER_NUM_GO_LABELS", 32102),
    )
    weights = args.weights or paths.get(args.weights_path_name)
    if weights and os.path.exists(weights):
        params, state = proteinfer_from_tf_pickle(weights, pi_cfg)
    else:
        logger.warning("weights unavailable (%s); random init", weights)
        params, state = init_proteinfer(jax.random.PRNGKey(0), pi_cfg)

    # classifier-head label order (ProteInfer's own vocabulary)
    if args.vocab_json:
        with open(args.vocab_json) as fh:
            head_vocab = json.load(fh)
    else:
        head_vocab = None

    data_path = paths[args.test_path_name]
    ds = ProteinDataset(data_path, DatasetConfig(dataset_type="test"))
    # map dataset labels onto head columns
    if head_vocab is not None:
        col_of = {l: j for j, l in enumerate(head_vocab)}
        eval_labels = [l for l in ds.label_vocabulary if l in col_of]
        cols = np.array([col_of[l] for l in eval_labels], dtype=np.int64)
    else:
        # without the published vocab file, assume the dataset vocabulary IS
        # the head order prefix (toy/testing mode)
        eval_labels = ds.label_vocabulary[: pi_cfg.num_labels]
        cols = np.arange(len(eval_labels))

    if args.only_represented_labels:
        rep = [l in ds.label_frequency for l in eval_labels]
        eval_labels = [l for l, r in zip(eval_labels, rep) if r]
        cols = cols[np.array(rep, dtype=bool)]

    label_idx = {l: j for j, l in enumerate(eval_labels)}

    normalizer = None
    if args.normalize_probabilities:
        if not args.parenthood_json:
            raise SystemExit("--normalize-probabilities requires --parenthood-json")
        from protnote_tpu.evaln.go_dag import DagNormalizer

        with open(args.parenthood_json) as fh:
            parenthood = json.load(fh)
        normalizer = DagNormalizer(eval_labels, parenthood)

    # params travel as jit ARGUMENTS, committed to the device once (closure
    # capture would constant-fold ~200MB into the HLO; host-committed args
    # would re-upload per batch)
    params = jax.device_put(params, jax.devices()[0])
    state = jax.device_put(state, jax.devices()[0])

    @jax.jit
    def forward(params, state, aa_ids, lengths):
        onehot = one_hot_sequences(aa_ids, pi_cfg.input_channels)
        logits, _ = proteinfer_forward(params, state, onehot, lengths, pi_cfg)
        return logits

    metrics = EvalMetrics(num_labels=len(eval_labels), threshold=args.threshold)
    batcher = BucketBatcher(ds, args.batch_size, return_label_multihots=False)
    all_logits, all_labels, all_ids = [], [], []
    for batch in batcher:
        logits = np.asarray(forward(params, state, jnp.asarray(batch.aa_ids),
                                    jnp.asarray(batch.lengths)))
        keep = batch.example_mask
        logits = logits[keep][:, cols]
        ids = [s for s, k in zip(batch.sequence_ids, keep) if k]
        labels = np.zeros((len(ids), len(eval_labels)), dtype=np.uint8)
        # recover each example's labels from the dataset by sequence id
        id_to_labels = getattr(ds, "_id_to_labels", None)
        if id_to_labels is None:
            id_to_labels = {sid: ds.label_id_lists[i] for i, sid in enumerate(ds.sequence_ids)}
            ds._id_to_labels = id_to_labels
        for r, sid in enumerate(ids):
            for li in id_to_labels.get(sid, []):
                l = ds.int2label[int(li)]
                j = label_idx.get(l)
                if j is not None:
                    labels[r, j] = 1
        probs = 1.0 / (1.0 + np.exp(-logits.astype(np.float32)))
        if normalizer is not None:
            probs = normalizer(probs)
        metrics.update(probs, labels)
        if args.save_prediction_results:
            all_logits.append(logits.astype(np.float16))
            all_labels.append(labels)
            all_ids.extend(ids)

    result = metrics.compute()
    print(json.dumps(result, default=float))
    if args.save_prediction_results and all_logits:
        out_dir = args.output_dir or paths.get("RESULTS_DIR", "outputs/results")
        save_evaluation_results(
            {"logits": np.concatenate(all_logits), "labels": np.concatenate(all_labels),
             "sequence_ids": all_ids},
            eval_labels, args.name, out_dir, "test",
        )
    return result


if __name__ == "__main__":
    main()
