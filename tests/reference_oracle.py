"""Test-side alias for the packaged reference-oracle machinery.

See protnote_tpu/core/reference_oracle.py — the stub installer and loaders
live in the package so ``cli/check_parity.py --reference-code`` can reuse
them at runtime.
"""

from protnote_tpu.core.reference_oracle import (  # noqa: F401
    REFERENCE_ROOT,
    install_reference_stubs,
    load_reference_modules,
    randomize_bn_running_stats,
)
