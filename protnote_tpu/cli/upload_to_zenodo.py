"""Upload result artefacts to Zenodo (reference bin/upload_to_zenodo.py).

Gated on network access and a ZENODO_ACCESS_TOKEN env var; uses the plain
deposition REST API via urllib (no extra dependencies)."""

from __future__ import annotations

import argparse
import json
import logging
import os
import urllib.parse
import urllib.request

logger = logging.getLogger(__name__)

API = "https://zenodo.org/api/deposit/depositions"


def _request(url: str, token: str, method: str = "GET", data=None,
             headers=None):
    # token rides the Authorization header, never the URL: query-string
    # tokens land in proxy/server logs and in HTTPError messages
    hdrs = {"Authorization": f"Bearer {token}", **(headers or {})}
    req = urllib.request.Request(url, data=data, method=method, headers=hdrs)
    with urllib.request.urlopen(req) as resp:
        return json.loads(resp.read() or b"{}")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("files", nargs="+", help="files to upload")
    ap.add_argument("--title", default=None,
                    help="required when creating a new deposition; unused "
                         "with --deposition-id")
    ap.add_argument("--description", default="protnote-tpu artefacts")
    ap.add_argument("--deposition-id", default=None,
                    help="existing deposition to append to")
    args = ap.parse_args(argv)

    logging.basicConfig(level=logging.INFO)
    token = os.environ.get("ZENODO_ACCESS_TOKEN")
    if not token:
        raise SystemExit("set ZENODO_ACCESS_TOKEN to upload to Zenodo")

    if args.deposition_id:
        dep = _request(f"{API}/{args.deposition_id}", token)
    else:
        if not args.title:
            raise SystemExit("--title is required when creating a deposition")
        dep = _request(
            API, token, method="POST",
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
        # stream the file object (result artefacts are GB-scale; fh.read()
        # would hold the whole file in RAM) with the name URL-encoded
        with open(path, "rb") as fh:
            _request(
                f"{bucket}/{urllib.parse.quote(name)}", token,
                method="PUT", data=fh,
                headers={"Content-Length": str(os.path.getsize(path))},
            )
    logger.info("deposition %s ready (publish manually from the web UI)", dep["id"])


if __name__ == "__main__":
    main()
