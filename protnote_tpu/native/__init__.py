from protnote_tpu.native import fastparse
