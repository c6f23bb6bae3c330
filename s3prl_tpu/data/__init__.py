from .encoder import CategoryEncoder, CategoryEncoders, CharacterTokenizer, WordTokenizer, PhonemeTokenizer, load_tokenizer
from .sampler import (
    BalancedWeightedSampler,
    DistributedBatchSamplerWrapper,
    FixedBatchSizeBatchSampler,
    GroupSameItemSampler,
    MaxTimestampBatchSampler,
    SortedBucketingSampler,
    SortedSliceSampler,
)
from .collate import Buckets, pad_collate
from .audio import load_wav
