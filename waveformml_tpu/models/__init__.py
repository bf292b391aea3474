import waveformml_tpu.nn  # registers torch-name layer/criterion wrappers
from waveformml_tpu.models import algorithm  # registers SCN adapters
from waveformml_tpu.models.blocks import (
    Conv1DNet, Conv2DBlock, DilationBlock, LinearBlock, LinearPlanes,
    PointwiseReducer, TemporalBlock, TemporalConvNet)
from waveformml_tpu.models.recurrent_blocks import RecurrentBlock, RecurrentNet
from waveformml_tpu.models.sparse_blocks import (
    ExtractedFeatureConv, Pointwise2DForZ, SparseConv2DBlock, SparseConv2DForEZ,
    SparseConv2DForZ, SparseConv2DPreserve)
from waveformml_tpu.models.nets import (
    DenseConvNet, ExtractedFeatureConvNet, SCNet, SingleEndedEZConv,
    SingleEndedZConv, SPConvNet, SPConvPreserveNet, batch_to_grid)
from waveformml_tpu.models.graph_net import (
    Graph3DNet, GraphNet, GraphZ, GraphZNet, PointNet, SingleEndedEZGraph)
from waveformml_tpu.models.waveform_models import (
    ConvWaveformNet, LinearWaveformNet, RecurrentWaveformNet, TemporalWaveformNet)

__all__ = [
    "Conv1DNet", "Conv2DBlock", "DilationBlock", "LinearBlock", "LinearPlanes",
    "PointwiseReducer", "TemporalBlock", "TemporalConvNet", "RecurrentBlock",
    "RecurrentNet", "ExtractedFeatureConv", "Pointwise2DForZ",
    "SparseConv2DBlock", "SparseConv2DForEZ", "SparseConv2DForZ",
    "SparseConv2DPreserve", "DenseConvNet", "ExtractedFeatureConvNet", "SCNet",
    "SingleEndedEZConv", "SingleEndedZConv", "SPConvNet", "SPConvPreserveNet",
    "batch_to_grid", "ConvWaveformNet", "LinearWaveformNet",
    "RecurrentWaveformNet", "TemporalWaveformNet", "GraphNet",
    "GraphZ", "GraphZNet", "PointNet", "Graph3DNet", "SingleEndedEZGraph",
]
