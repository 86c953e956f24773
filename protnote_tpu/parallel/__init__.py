from protnote_tpu.parallel.mesh import (
    MeshSpec,
    make_mesh,
    shardings_for_batch,
    replicated,
)
