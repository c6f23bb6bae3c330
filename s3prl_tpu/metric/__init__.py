from .common import (
    accuracy,
    cer,
    compute_eer,
    compute_minDCF,
    edit_distance,
    per,
    ter,
    wer,
)
from .diarization import calc_diarization_error
from .quality import pesq, stoi
from .slot_filling import slot_edit_f1_full, slot_edit_f1_part, slot_type_f1, slot_value_cer, slot_value_wer
