from . import librispeech, voxceleb1, speech_commands, fluent_commands, iemocap
