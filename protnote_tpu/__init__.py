"""protnote_tpu: a TPU-native framework for multimodal protein function prediction.

Re-implements the capabilities of microsoft/protnote (two-tower sequence x
free-text-label scoring with zero-shot generalisation) as an idiomatic
JAX/XLA/Pallas stack:

- ``protnote_tpu.models.proteinfer``: masked dilated-CNN protein encoder
  (reference: protnote/models/protein_encoders.py).
- ``protnote_tpu.models.fusion``: projection heads + pairwise fusion scorer
  (reference: protnote/models/ProtNote.py).
- ``protnote_tpu.ops``: XLA/Pallas pair-scoring kernels (the (B*L, H) MLP hot
  loop, reference ProtNote.py:112-152,293).
- ``protnote_tpu.data``: FASTA ingestion, vocabularies, BLOSUM augmentation,
  bucketed static-shape batching, label-embedding cache.
- ``protnote_tpu.train``: loss zoo, pjit train/eval steps over a (dp, label)
  device mesh, trainer loop, checkpointing.
- ``protnote_tpu.evaln``: streaming metric library (mAP micro/macro, F1
  family, samplewise metrics), result serialization, GO-DAG normaliser.
"""

__version__ = "0.1.0"
