"""Model package: convenience re-exports, resolved lazily (PEP 562).

Eager re-exports created an import cycle: ``ops/pair_scorer`` imports
``models.layers``, which first executes this package ``__init__``; an eager
``from .fusion import ...`` here then re-enters ``ops.pair_scorer`` (fusion
imports its folded-BN constants) while it is still half-initialized.
"""

_EXPORTS = {
    "ProteInferConfig": "protnote_tpu.models.proteinfer",
    "init_proteinfer": "protnote_tpu.models.proteinfer",
    "proteinfer_embed": "protnote_tpu.models.proteinfer",
    "proteinfer_forward": "protnote_tpu.models.proteinfer",
    "ProtNoteConfig": "protnote_tpu.models.fusion",
    "init_protnote": "protnote_tpu.models.fusion",
    "protnote_forward": "protnote_tpu.models.fusion",
}

__all__ = list(_EXPORTS)


def __getattr__(name):
    if name in _EXPORTS:
        import importlib

        return getattr(importlib.import_module(_EXPORTS[name]), name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
