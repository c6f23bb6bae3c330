from . import audio
from .masking import length_mask, lengths_after_conv1d
