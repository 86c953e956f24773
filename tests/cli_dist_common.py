"""Shared pieces of the single- and multi-process CLI e2e runs."""

OVERRIDES = [
    "NUM_EPOCHS", "1", "TRAIN_BATCH_SIZE", "8", "VALIDATION_BATCH_SIZE", "8",
    "TEST_BATCH_SIZE", "8", "SEQUENCE_BUCKETS", "[128]",
    "EXTRACT_VOCABULARIES_FROM", "null",
    "PROTEIN_EMBEDDING_DIM", "48", "LABEL_EMBEDDING_DIM", "32",
    "LATENT_EMBEDDING_DIM", "16", "PROJECTION_HEAD_NUM_LAYERS", "2",
    "OUTPUT_MLP_NUM_LAYERS", "2", "OUTPUT_MLP_HIDDEN_DIM_SCALE_FACTOR", "2",
    "PROJECTION_HEAD_HIDDEN_DIM_SCALE_FACTOR", "2",
    "MIXED_PRECISION", "False",
    # metrics must accumulate on device (readback of a non-addressable
    # global logits array is impossible multi-process)
    "ESTIMATE_MAP", "True",
    # null threshold routes validation through the on-device threshold
    # sweep — multi-process, its (T, L) counters must be mesh-replicated
    # global arrays (a local jnp.zeros cannot mix with global logits)
    "DECISION_TH", "null",
    "SEED", "7",
]


def patch_small_encoder():
    """Shrink the frozen encoder dims so a CPU run is fast (same trick as
    tests/test_train_e2e.py)."""
    from protnote_tpu.core import config as cfgmod

    orig_load = cfgmod.load_config

    def load_small(path=cfgmod.DEFAULT_CONFIG_PATH):
        cfg = orig_load(path)
        cfg["embed_sequences_params"].update(
            OUTPUT_CHANNELS=48, KERNEL_SIZE=5, NUM_RESNET_BLOCKS=1,
            PROTEINFER_NUM_GO_LABELS=10,
        )
        return cfg

    cfgmod.load_config = load_small
