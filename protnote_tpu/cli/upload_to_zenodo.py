"""Upload result artefacts to Zenodo (reference bin/upload_to_zenodo.py).

Gated on network access and a ZENODO_ACCESS_TOKEN env var; uses the plain
deposition REST API via urllib (no extra dependencies)."""

from __future__ import annotations

import argparse
import json
import logging
import os
import urllib.request

logger = logging.getLogger(__name__)

API = "https://zenodo.org/api/deposit/depositions"


def _request(url: str, method: str = "GET", data=None, headers=None):
    req = urllib.request.Request(url, data=data, method=method,
                                 headers=headers or {})
    with urllib.request.urlopen(req) as resp:
        return json.loads(resp.read() or b"{}")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("files", nargs="+", help="files to upload")
    ap.add_argument("--title", required=True)
    ap.add_argument("--description", default="protnote-tpu artefacts")
    ap.add_argument("--deposition-id", default=None,
                    help="existing deposition to append to")
    args = ap.parse_args(argv)

    logging.basicConfig(level=logging.INFO)
    token = os.environ.get("ZENODO_ACCESS_TOKEN")
    if not token:
        raise SystemExit("set ZENODO_ACCESS_TOKEN to upload to Zenodo")

    auth = f"?access_token={token}"
    if args.deposition_id:
        dep = _request(f"{API}/{args.deposition_id}{auth}")
    else:
        dep = _request(
            f"{API}{auth}", method="POST",
            data=json.dumps({"metadata": {
                "title": args.title, "upload_type": "dataset",
                "description": args.description,
                "creators": [{"name": "protnote-tpu"}],
            }}).encode(),
            headers={"Content-Type": "application/json"},
        )
    bucket = dep["links"]["bucket"]
    for path in args.files:
        name = os.path.basename(path)
        logger.info("uploading %s", name)
        with open(path, "rb") as fh:
            _request(f"{bucket}/{name}{auth}", method="PUT", data=fh.read())
    logger.info("deposition %s ready (publish manually from the web UI)", dep["id"])


if __name__ == "__main__":
    main()
