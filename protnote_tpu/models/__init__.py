from protnote_tpu.models.proteinfer import ProteInferConfig, init_proteinfer, proteinfer_embed, proteinfer_forward
from protnote_tpu.models.fusion import ProtNoteConfig, init_protnote, protnote_forward
