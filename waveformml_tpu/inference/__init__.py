from waveformml_tpu.inference.model import InferenceModel
from waveformml_tpu.inference.prediction_writer import (
    IRNIMPredictionWriter, IRNPredictionWriter, PredictionWriter,
    ZAndClassWriter, ZPredictionWriter)

__all__ = ["InferenceModel", "PredictionWriter", "ZPredictionWriter",
           "IRNPredictionWriter", "IRNIMPredictionWriter", "ZAndClassWriter"]
