from protnote_tpu.ops.pair_scorer import (
    FoldedOutputMLP,
    fold_output_mlp,
    joint_embeddings,
    output_mlp_apply,
    pair_logits_dense,
    pair_logits_tiled,
    similarity_logits,
)
