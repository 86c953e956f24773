"""Data layer: FASTA ingestion, vocabularies, BLOSUM augmentation,
annotation parsing, label-embedding caches, datasets, and static-shape
bucketed batching for the TPU input pipeline."""
