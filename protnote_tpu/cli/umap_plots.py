"""Embedding-projection plots (reference bin/umap_plots.py + the UMAP figures
in Results.ipynb): project exported sequence/label embeddings to 2-D and save
a scatter coloured by a metadata column.  Uses umap-learn when installed,
falling back to PCA (sklearn) in minimal environments."""

from __future__ import annotations

import argparse
import logging

import numpy as np

logger = logging.getLogger(__name__)


def project_2d(x: np.ndarray, method: str = "auto", n_neighbors: int = 15,
               min_dist: float = 0.1, seed: int = 42) -> np.ndarray:
    if method in ("auto", "umap"):
        try:
            import umap  # type: ignore

            return umap.UMAP(
                n_neighbors=n_neighbors, min_dist=min_dist, random_state=seed
            ).fit_transform(x)
        except ImportError:
            if method == "umap":
                raise
            logger.warning("umap-learn not installed; falling back to PCA")
    from sklearn.decomposition import PCA

    return PCA(n_components=2, random_state=seed).fit_transform(x)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--embeddings", required=True,
                    help=".npz with 'embeddings' (+ optional 'sequence_ids')")
    ap.add_argument("--output", required=True, help="output .png")
    ap.add_argument("--method", choices=["auto", "umap", "pca"], default="auto")
    ap.add_argument("--color-by", default=None,
                    help="CSV mapping id -> category for point colours")
    ap.add_argument("--n-neighbors", type=int, default=15)
    ap.add_argument("--min-dist", type=float, default=0.1)
    ap.add_argument("--sample", type=int, default=20000)
    args = ap.parse_args(argv)

    logging.basicConfig(level=logging.INFO)
    with np.load(args.embeddings, allow_pickle=True) as z:
        emb = z["embeddings"].astype(np.float32)
        ids = z["sequence_ids"] if "sequence_ids" in z else None

    if len(emb) > args.sample:
        sel = np.random.default_rng(0).choice(len(emb), args.sample, replace=False)
        emb = emb[sel]
        ids = ids[sel] if ids is not None else None

    xy = project_2d(emb, args.method, args.n_neighbors, args.min_dist)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    colors = None
    if args.color_by and ids is not None:
        import pandas as pd

        meta = pd.read_csv(args.color_by, index_col=0).iloc[:, 0]
        cats = meta.reindex(ids).fillna("unknown")
        codes, uniques = cats.factorize()
        colors = codes
    fig, ax = plt.subplots(figsize=(8, 8))
    sc = ax.scatter(xy[:, 0], xy[:, 1], s=2, c=colors, cmap="tab10", alpha=0.6)
    ax.set_xticks([])
    ax.set_yticks([])
    fig.savefig(args.output, dpi=200, bbox_inches="tight")
    logger.info("wrote %s (%d points)", args.output, len(xy))


if __name__ == "__main__":
    main()
