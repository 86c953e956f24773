from protnote_tpu.ops.pair_scorer import (
    FoldedOutputMLP,
    fold_output_mlp,
    joint_embeddings,
    output_mlp_apply,
    pair_logits_dense,
    pair_logits_tiled,
    similarity_logits,
)
from protnote_tpu.ops.streaming_train import pair_logits_streaming_train
