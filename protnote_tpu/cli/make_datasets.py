"""Dataset-construction CLI: SwissProt -> FASTA splits, zero-shot label
splits, BLAST-runtime subsets, top-label subsets, ProteInfer TFRecord
ingestion.  One entry point covering the reference's
make_dataset_from_swissprot.py / make_zero_shot_datasets_from_proteinfer.py /
create_test_sets.py / make_proteinfer_dataset.py."""

from __future__ import annotations

import argparse
import json
import logging
import os

from protnote_tpu.core.config import DEFAULT_CONFIG_PATH, load_config, resolve_paths
from protnote_tpu.data import builders

logger = logging.getLogger(__name__)


def main(argv=None):
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)

    sp = sub.add_parser("from-swissprot", help="filter a SwissProt .dat into a FASTA split")
    sp.add_argument("--swissprot-dat", required=True)
    sp.add_argument("--output", required=True)
    sp.add_argument("--parenthood-json", required=True)
    sp.add_argument("--label-vocabulary", choices=["proteinfer", "new", "all"], default="all")
    sp.add_argument("--sequence-vocabulary",
                    choices=["proteinfer_train", "proteinfer_test", "new", "all"],
                    default="all")
    sp.add_argument("--only-leaf-nodes", action="store_true")
    sp.add_argument("--train-fasta")
    sp.add_argument("--val-fasta")
    sp.add_argument("--test-fasta")
    sp.add_argument("--full-fasta")
    sp.add_argument("--old-annotations")
    sp.add_argument("--new-annotations")

    zs = sub.add_parser("zero-shot-splits", help="80/10/10 label-split fakes")
    zs.add_argument("--train-fasta", required=True)
    zs.add_argument("--val-fasta", required=True)
    zs.add_argument("--test-fasta", required=True)
    zs.add_argument("--full-fasta", required=True)
    zs.add_argument("--output-dir", required=True)
    zs.add_argument("--seed", type=int, default=42)

    bs = sub.add_parser("blast-subsets", help="size-graded runtime subsets")
    bs.add_argument("--test-fasta", required=True)
    bs.add_argument("--output-dir", required=True)
    bs.add_argument("--sizes", type=int, nargs="+",
                    default=[1, 10, 100, 500, 1000, 5000, 10000, 15000, 20000])

    tl = sub.add_parser("top-labels", help="keep top-k most frequent labels")
    tl.add_argument("--test-fasta", required=True)
    tl.add_argument("--output", required=True)
    tl.add_argument("--top-k", type=int, default=300)

    tf = sub.add_parser("from-tfrecords", help="ProteInfer TFRecords -> FASTA")
    tf.add_argument("--input-dir", required=True)
    tf.add_argument("--output", required=True)
    tf.add_argument("--annotation-types", nargs="+", default=["GO"])
    tf.add_argument("--pattern", default="*.tfrecord")

    args = ap.parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    if args.cmd == "from-swissprot":
        with open(args.parenthood_json) as fh:
            parenthood = json.load(fh)
        old_ids = new_ids = None
        names = None
        # each annotation table loads independently: label-vocabulary
        # 'proteinfer' needs only --old-annotations (an AND gate previously
        # rejected that valid combination)
        if args.old_annotations:
            import pandas as pd

            old_ids = set(pd.read_pickle(args.old_annotations).index)
        if args.new_annotations:
            import pandas as pd

            new_df = pd.read_pickle(args.new_annotations)
            new_ids = set(new_df.index)
            names = new_df["name"].to_dict()
        n = builders.build_dataset_from_swissprot(
            args.swissprot_dat, args.output, parenthood,
            label_vocabulary=args.label_vocabulary,
            sequence_vocabulary=args.sequence_vocabulary,
            proteinfer_train_fasta=args.train_fasta,
            proteinfer_val_fasta=args.val_fasta,
            proteinfer_test_fasta=args.test_fasta,
            proteinfer_full_fasta=args.full_fasta,
            label_ids_old=old_ids, label_ids_new=new_ids,
            only_leaf_nodes=args.only_leaf_nodes,
            annotations_names=names,
        )
        logger.info("wrote %d sequences", n)
    elif args.cmd == "zero-shot-splits":
        out = builders.make_zero_shot_datasets(
            args.train_fasta, args.val_fasta, args.test_fasta, args.full_fasta,
            args.output_dir, args.seed,
        )
        logger.info("wrote %s", out)
    elif args.cmd == "blast-subsets":
        out = builders.make_blast_runtime_subsets(
            args.test_fasta, args.output_dir, args.sizes,
        )
        logger.info("wrote %s", out)
    elif args.cmd == "top-labels":
        n = builders.make_top_labels_subset(args.test_fasta, args.output, args.top_k)
        logger.info("wrote %d sequences", n)
    elif args.cmd == "from-tfrecords":
        n = builders.proteinfer_tfrecords_to_fasta(
            args.input_dir, args.output, args.annotation_types, args.pattern,
        )
        logger.info("wrote %d sequences", n)


if __name__ == "__main__":
    main()
