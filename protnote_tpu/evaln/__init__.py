from protnote_tpu.evaln.metrics import (
    ConfusionAccumulator,
    SamplewiseAccumulator,
    ExactAUPRC,
    BinnedAUPRC,
    EvalMetrics,
    average_precision,
)
