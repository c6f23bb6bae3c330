"""Feature dumping task (reference: s3prl/task/dump_feature.py).

Extracts featurized upstream representations and writes one .npy per
utterance — used to produce offline features (e.g. k-means unit training
for HuBERT pretraining).
"""

from __future__ import annotations

from pathlib import Path
from typing import List

import numpy as np


def dump_features(
    upstream,
    loader,
    out_dir,
    layer: int = -1,
) -> List[str]:
    """Run the upstream over a DataLoader, save [T, H] per utterance."""
    import jax.numpy as jnp

    from ..train.trainer import _split_batch

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    written = []
    for batch in loader:
        device, host = _split_batch(batch)
        hs, h_lens = upstream(jnp.asarray(device["x"]), jnp.asarray(device["x_len"]))
        hs = np.asarray(hs)
        h_lens = np.asarray(h_lens)
        for b, name in enumerate(host.get("unique_name", range(len(h_lens)))):
            path = out_dir / f"{name}.npy"
            np.save(path, hs[layer, b, : int(h_lens[b])])
            written.append(str(path))
    return written
