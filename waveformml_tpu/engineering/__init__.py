from waveformml_tpu.engineering.base import TaskBase
from waveformml_tpu.engineering.tasks import (
    LitEZ, LitPSD, LitSegClassifier, LitSegQuantifier, LitWaveform, LitZ)
from waveformml_tpu.engineering.trainer import Trainer
from waveformml_tpu.engineering.callbacks import EarlyStopping, LoggingCallback

__all__ = ["TaskBase", "LitPSD", "LitWaveform", "LitZ", "LitEZ",
           "LitSegClassifier", "LitSegQuantifier", "Trainer", "EarlyStopping",
           "LoggingCallback"]
