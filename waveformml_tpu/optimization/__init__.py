from waveformml_tpu.optimization.hpo import (
    MedianPruner, ModelOptimization, NopPruner, RandomSampler, Study,
    TPESampler, Trial, TrialPruned, create_study,
)

__all__ = ["MedianPruner", "ModelOptimization", "NopPruner", "RandomSampler",
           "Study", "TPESampler", "Trial", "TrialPruned", "create_study"]
