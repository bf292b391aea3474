from waveformml_tpu.evaluation.ad1 import AD1Evaluator, SingleEndedEvaluator
from waveformml_tpu.evaluation.calibrator import Calibrator
from waveformml_tpu.evaluation.energy_eval import (
    EnergyEvaluatorBase, EnergyEvaluatorPhys, EnergyEvaluatorWF)
from waveformml_tpu.evaluation.ez_eval import (
    EZEvaluatorBase, EZEvaluatorPhys, EZEvaluatorWF)
from waveformml_tpu.evaluation.metric_agg import (
    Metric2DAggregator, MetricAggregator, MetricPairAggregator)
from waveformml_tpu.evaluation.pid_eval import (
    PID_MAP, PID_MAPPED_NAMES, PIDEvaluator, map_pid, retrieve_class_names_PIDS)
from waveformml_tpu.evaluation.psd_eval import PhysEvaluator, PSDEvaluator
from waveformml_tpu.evaluation.roc import ROCCurve
from waveformml_tpu.evaluation.seg_eval import RealDataEvaluator, SegEvaluator
from waveformml_tpu.evaluation.stats import (
    ErrorAggregator, StatsAggregator, calc_photon_moments, calc_time_moments)
from waveformml_tpu.evaluation.tensor_eval import TensorEvaluator
from waveformml_tpu.evaluation.waveform_eval import WaveformEvaluator
from waveformml_tpu.evaluation.z_eval import (
    ZEvaluatorBase, ZEvaluatorPhys, ZEvaluatorRealWFNorm, ZEvaluatorWF)

__all__ = [
    "AD1Evaluator", "SingleEndedEvaluator", "Calibrator",
    "EnergyEvaluatorBase", "EnergyEvaluatorPhys", "EnergyEvaluatorWF",
    "EZEvaluatorBase", "EZEvaluatorPhys", "EZEvaluatorWF",
    "Metric2DAggregator", "MetricAggregator", "MetricPairAggregator",
    "PID_MAP", "PID_MAPPED_NAMES", "PIDEvaluator", "map_pid",
    "retrieve_class_names_PIDS", "PhysEvaluator", "PSDEvaluator", "ROCCurve",
    "RealDataEvaluator", "SegEvaluator", "ErrorAggregator", "StatsAggregator",
    "calc_photon_moments", "calc_time_moments", "TensorEvaluator",
    "WaveformEvaluator", "ZEvaluatorBase", "ZEvaluatorPhys",
    "ZEvaluatorRealWFNorm", "ZEvaluatorWF",
]
