from . import apc, baseline, hubert, mockingjay, npc, transformer, wav2vec2, wavlm
