"""Annotation ingestion CLI: GO .obo / Expasy EC files -> annotation tables
(+ parenthood JSON).  Covers the parsing half of the reference's
bin/download_GO_annotations.py / bin/download_EC_annotations.py /
bin/update_go_annotations.py.  Downloading itself is gated: in zero-egress
environments pass already-downloaded files via --obo / --enzclass /
--enzyme-dat."""

from __future__ import annotations

import argparse
import json
import logging
import os

logger = logging.getLogger(__name__)

GO_OBO_URL = "https://release.geneontology.org/{release}/ontology/go.obo"
EC_ENZCLASS_URL = "https://ftp.expasy.org/databases/enzyme/enzclass.txt"
EC_ENZYME_URL = "https://ftp.expasy.org/databases/enzyme/enzyme.dat"


def _download(url: str, dest: str) -> str:
    import urllib.request

    logger.info("downloading %s", url)
    os.makedirs(os.path.dirname(dest) or ".", exist_ok=True)
    urllib.request.urlretrieve(url, dest)
    return dest


def main(argv=None):
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)

    go = sub.add_parser("go")
    go.add_argument("--obo", default=None, help="local go.obo (skips download)")
    go.add_argument("--release", default="2024-06-17")
    go.add_argument("--output", required=True, help="annotations pickle path")
    go.add_argument("--parenthood-output", default=None)

    upd = sub.add_parser("update-go", help="2019 vocab + additions from a newer release")
    upd.add_argument("--old", required=True, help="2019 annotations pickle")
    upd.add_argument("--new", required=True, help="2024 annotations pickle")
    upd.add_argument("--output", required=True)

    ec = sub.add_parser("ec")
    ec.add_argument("--enzclass", default=None)
    ec.add_argument("--enzyme-dat", default=None)
    ec.add_argument("--output", required=True)

    sp = sub.add_parser(
        "swissprot",
        help="download + gunzip a SwissProt release .dat "
             "(reference bin/download_swissprot.py)",
    )
    sp.add_argument(
        "--url",
        default="https://ftp.uniprot.org/pub/databases/uniprot/"
                "current_release/knowledgebase/complete/uniprot_sprot.dat.gz",
    )
    sp.add_argument("--output", required=True, help="unzipped .dat destination")

    args = ap.parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    if args.cmd == "go":
        from protnote_tpu.data.annotations import go_annotations_dataframe, go_parenthood

        obo = args.obo or _download(
            GO_OBO_URL.format(release=args.release),
            os.path.join(os.path.dirname(args.output) or ".", "go.obo"),
        )
        df = go_annotations_dataframe(obo)
        os.makedirs(os.path.dirname(args.output) or ".", exist_ok=True)
        df.to_pickle(args.output)
        logger.info("wrote %d GO annotations to %s", len(df), args.output)
        if args.parenthood_output:
            closure = go_parenthood(obo)
            # the reference parenthood JSON includes the term itself
            closure = {k: sorted(set(v) | {k}) for k, v in closure.items()}
            with open(args.parenthood_output, "w") as fh:
                json.dump(closure, fh)
            logger.info("wrote parenthood closure to %s", args.parenthood_output)

    elif args.cmd == "update-go":
        # Keep the 2019 vocabulary's rows, refreshed with any new descriptions,
        # plus labels added since (reference bin/update_go_annotations.py:6-25).
        import pandas as pd

        old = pd.read_pickle(args.old)
        new = pd.read_pickle(args.new)
        updated = new.reindex(new.index.union(old.index))
        missing = updated["name"].isna()
        if missing.any():
            updated.loc[missing & updated.index.isin(old.index)] = old.loc[
                updated.index[missing & updated.index.isin(old.index)]
            ]
        updated.to_pickle(args.output)
        logger.info("wrote %d updated annotations", len(updated))

    elif args.cmd == "ec":
        from protnote_tpu.data.annotations import ec_annotations_dataframe

        enzclass = args.enzclass or _download(
            EC_ENZCLASS_URL,
            os.path.join(os.path.dirname(args.output) or ".", "enzclass.txt"),
        )
        enzyme = args.enzyme_dat or _download(
            EC_ENZYME_URL,
            os.path.join(os.path.dirname(args.output) or ".", "enzyme.dat"),
        )
        df = ec_annotations_dataframe(enzclass, enzyme)
        os.makedirs(os.path.dirname(args.output) or ".", exist_ok=True)
        df.to_pickle(args.output)
        logger.info("wrote %d EC annotations to %s", len(df), args.output)

    elif args.cmd == "swissprot":
        import gzip
        import shutil

        gz = _download(args.url, args.output + ".gz")
        logger.info("unzipping %s", gz)
        with gzip.open(gz, "rb") as src, open(args.output, "wb") as dst:
            shutil.copyfileobj(src, dst, length=16 * 1024 * 1024)
        os.unlink(gz)
        logger.info("wrote %s (feed to make_datasets from-swissprot)", args.output)


if __name__ == "__main__":
    main()
