from .base import Problem
from .common import CommonExample, IcExample, SuperbER, SuperbIC, SuperbKS, SuperbSID
from .asr import AsrExample, SuperbASR, SuperbPR, SuperbSF
from .asv import (
    AmsoftmaxSegmentExample,
    AsvExample,
    Ge2eExample,
    SuperbASV,
    Voxceleb2AMSoftmaxSegment,
    Voxceleb2GE2E,
)
from .diarization import SdExample, SuperbSD
from .hear import (
    HearBeijingOpera,
    HearCremaD,
    HearDcase2016Task2,
    HearESC50,
    HearEvent,
    HearEventExample,
    HearFSD,
    HearGSC5hr,
    HearGtzan,
    HearGtzanMusicSpeech,
    HearGunshot,
    HearLibriCount,
    HearMaestro,
    HearNsynth5hr,
    HearScene,
    HearStroke,
    HearTonic,
    HearVocal,
    HearVoxLingual,
)
from .frame_probe import (
    FrameProbeExample,
    LibriPhone1Hidden,
    LibriPhoneConcat,
    LibriPhoneLinear,
    SpeakerLinearFrame,
    SpeakerLinearUtter,
    TimitPhone1Hidden,
    TimitPhoneConcat,
    TimitPhoneConvBank,
    TimitPhoneLinear,
    Voxceleb1FrameLevel,
)
from .mos import MosExample, MosPrediction
from .slu import MoseiSentiment, SluATIS, SluAudioSnips, SluExample
from .qbe import QbeDTW, QbeExample
from .qbe_embedding import QbeEmbeddingExample, QbeEmbeddingQuesst14, Sws2013Embedding
from .enhancement import SeExample, SuperbSE, SuperbSS
from .translation import StExample, SuperbST
from .vc import VcExample, VcVcc2020
from .pretrain import (
    PretrainAPC,
    PretrainData2Vec,
    PretrainData2VecExample,
    PretrainAudioAlbert,
    PretrainDistiller,
    PretrainExample,
    PretrainHubert,
    PretrainHubertExample,
    PretrainMockingjay,
    PretrainNPC,
    PretrainSpecAugment,
    PretrainTera,
    PretrainVqApc,
)
