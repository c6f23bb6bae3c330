"""Offline length-file generation for bucketing.

Analog of the reference's s3prl/preprocess/generate_len_for_bucket.py: scan
an audio tree once, write a length-sorted CSV that the bucketing samplers
consume without touching audio headers at train time.

CLI: python -m s3prl_tpu.preprocess.generate_len_for_bucket <audio_root> <out_csv>
"""

from __future__ import annotations

import sys
from pathlib import Path

import pandas as pd


def generate_len_for_bucket(audio_root, out_csv, exts=(".wav",)) -> pd.DataFrame:
    from ..data.audio import audio_info

    rows = []
    root = Path(audio_root)
    for ext in exts:
        for path in sorted(root.rglob(f"*{ext}")):
            info = audio_info(path)
            rows.append(
                dict(
                    id=str(path.relative_to(root)).replace("/", "-"),
                    wav_path=str(path),
                    length=info["num_frames"],
                    duration=info["duration"],
                )
            )
    df = pd.DataFrame(rows).sort_values("length", ascending=False)
    df.to_csv(out_csv, index=False)
    return df


if __name__ == "__main__":
    generate_len_for_bucket(sys.argv[1], sys.argv[2])
