from .upstream import SUpstream, Featurizer, UpstreamDownstreamModel
from .heads import (
    FrameLevel,
    FrameLevelLinear,
    MeanPoolingLinear,
    UtteranceLevel,
    MeanPooling,
    TemporalStatisticsPooling,
    SelfAttentivePooling,
    RNNEncoder,
)
from .specaug import SpecAug
