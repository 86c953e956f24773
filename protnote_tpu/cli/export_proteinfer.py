"""Export ProteInfer TF SavedModel variables to the pickle layout our
converter reads.

Reference: bin/export_proteinfer.py runs inside a TF1.15 conda env and dumps
``{variable_name: value}`` via a tf.Session.  Here we use TF2's compat layer
(tensorflow is available in this image) so no separate environment is needed;
the resulting pickle feeds ``models/convert.py:proteinfer_from_tf_pickle``.

Gated: requires a downloaded ProteInfer SavedModel directory (see
cli/download_proteinfer.py).
"""

from __future__ import annotations

import argparse
import logging
import os
import pickle

logger = logging.getLogger(__name__)


def export_savedmodel_variables(model_path: str, output_pickle: str) -> int:
    import tensorflow.compat.v1 as tf  # type: ignore

    tf.disable_eager_execution()
    graph = tf.Graph()
    with graph.as_default():
        with tf.Session(graph=graph) as sess:
            tf.saved_model.loader.load(sess, ["serve"], model_path)
            variables = graph.get_collection(tf.GraphKeys.GLOBAL_VARIABLES)
            # insertion order follows graph-collection order, which is the
            # construction order our positional converter expects
            values = sess.run({v.name: v for v in variables})
    os.makedirs(os.path.dirname(output_pickle) or ".", exist_ok=True)
    with open(output_pickle, "wb") as fh:
        pickle.dump(values, fh)
    logger.info("wrote %d variables to %s", len(values), output_pickle)
    return len(values)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-path", required=True, help="SavedModel directory")
    ap.add_argument("--output", required=True, help="output .pkl path")
    args = ap.parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    export_savedmodel_variables(args.model_path, args.output)


if __name__ == "__main__":
    main()
