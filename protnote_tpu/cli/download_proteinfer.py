"""Download + convert the five published ProteInfer GO seed models
(reference bin/download_and_test_proteinfer_seeds.py): fetch each tarball
from the proteinfer GCS bucket, extract, export variables to a pickle
(cli/export_proteinfer.py), and drop it where PROTEINFER_GO_WEIGHTS_PATH
expects it.  Gated on network access."""

from __future__ import annotations

import argparse
import logging
import os
import tarfile
import urllib.request

logger = logging.getLogger(__name__)

SEED_IDS = [13703706, 13703742, 13703997, 13704131, 13705631]
URL = (
    "https://storage.googleapis.com/brain-genomics-public/research/proteins/"
    "proteinfer/models/zipped_models/"
    "noxpd2_cnn_swissprot_go_random_swiss-cnn_for_swissprot_go_random-{id}.tar.gz"
)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ids", type=int, nargs="+", default=SEED_IDS)
    ap.add_argument("--output-dir", default="data/models/proteinfer")
    args = ap.parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    from protnote_tpu.cli.export_proteinfer import export_savedmodel_variables

    os.makedirs(args.output_dir, exist_ok=True)
    for model_id in args.ids:
        out_pkl = os.path.join(args.output_dir, f"GO_model_weights{model_id}.pkl")
        if os.path.exists(out_pkl):
            logger.info("%s exists; skipping", out_pkl)
            continue
        url = URL.format(id=model_id)
        tar_path = os.path.join(args.output_dir, os.path.basename(url))
        logger.info("downloading %s", url)
        urllib.request.urlretrieve(url, tar_path)
        with tarfile.open(tar_path) as tf_:
            # 'data' filter: the tarball comes from a third-party bucket —
            # block path traversal (../, absolute members); also the 3.14
            # default, so behavior stays stable across interpreters
            try:
                tf_.extractall(args.output_dir, filter="data")
            except TypeError:  # Python < 3.12 without the filter arg
                tf_.extractall(args.output_dir)
        model_dir = os.path.join(
            args.output_dir,
            f"noxpd2_cnn_swissprot_go_random_swiss-cnn_for_swissprot_go_random-{model_id}",
        )
        export_savedmodel_variables(model_dir, out_pkl)
        os.unlink(tar_path)
        import shutil

        shutil.rmtree(model_dir, ignore_errors=True)
        logger.info("converted seed %d -> %s", model_id, out_pkl)


if __name__ == "__main__":
    main()
