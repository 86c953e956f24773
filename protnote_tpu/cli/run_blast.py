"""BLAST top-hits baseline driver (reference bin/run_blast.py:22-162):
build the database from the train FASTA, query a test FASTA, transfer top-hit
labels, export a ±15 pseudo-logit matrix and the runtime CSV."""

from __future__ import annotations

import argparse
import logging
import os

import numpy as np

from protnote_tpu.baselines.blast import BlastTopHits, blast_available
from protnote_tpu.core.config import DEFAULT_CONFIG_PATH, load_config, resolve_paths
from protnote_tpu.data.fasta import read_fasta
from protnote_tpu.data.vocab import generate_vocabularies
from protnote_tpu.evaln.results_io import save_evaluation_results

logger = logging.getLogger(__name__)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=str(DEFAULT_CONFIG_PATH))
    ap.add_argument("--db-fasta", default=None, help="defaults to TRAIN_DATA_PATH")
    ap.add_argument("--query-fasta", default=None, help="defaults to TEST_DATA_PATH")
    ap.add_argument("--vocab-fasta", default=None, help="defaults to FULL_DATA_PATH")
    ap.add_argument("--output-dir", default=None)
    ap.add_argument("--run-name", default="blast")
    ap.add_argument("--num-threads", type=int, default=None)
    ap.add_argument("--timings-csv", default=None)
    args = ap.parse_args(argv)

    logging.basicConfig(level=logging.INFO)
    if not blast_available():
        raise SystemExit(
            "NCBI blast+ binaries (blastp/makeblastdb) not found on PATH; "
            "install them or skip the BLAST baseline."
        )

    cfg = resolve_paths(load_config(args.config))
    paths = cfg["paths_resolved"]
    db = args.db_fasta or paths["TRAIN_DATA_PATH"]
    queries = args.query_fasta or paths["TEST_DATA_PATH"]
    vocab_src = args.vocab_fasta or paths["FULL_DATA_PATH"]
    out_dir = args.output_dir or paths.get("RESULTS_DIR", "outputs/results")

    bt = BlastTopHits(db, queries)
    bt.run_blast(num_threads=args.num_threads)
    vocab = generate_vocabularies(file_path=vocab_src)["label_vocab"]
    logits, qids = bt.pseudo_logits(vocab)

    test = read_fasta(queries)
    label_idx = {l: j for j, l in enumerate(vocab)}
    labels = np.zeros_like(logits, dtype=np.uint8)
    for i, (_, sid, ls) in enumerate(test):
        for l in ls:
            j = label_idx.get(l)
            if j is not None:
                labels[i, j] = 1

    paths_written = save_evaluation_results(
        {"logits": logits, "labels": labels, "sequence_ids": qids},
        vocab, args.run_name, out_dir, "test",
    )
    if args.timings_csv:
        bt.save_timings(args.timings_csv, num_queries=len(qids))
    logger.info("BLAST baseline written: %s (timings: %s)", paths_written, bt.timings)


if __name__ == "__main__":
    main()
