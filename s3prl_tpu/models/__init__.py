from . import baseline, hubert, transformer, wav2vec2
