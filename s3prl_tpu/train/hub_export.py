"""Publish a trained downstream experiment to the Hugging Face Hub.

Behavioral spec from the reference's legacy runner
(/root/reference/s3prl/downstream/runner.py:526-594 push_to_huggingface_hub):
stage the experiment directory into a Hub repo layout, rename the dev-best
checkpoint to the `model.*` convention, generate a model card, and push.

TPU-native differences: checkpoints are msgpack step dirs (train/checkpoint
.py) rather than a monolithic states-N.ckpt, and the upload path is the
modern `huggingface_hub.HfApi.upload_folder` (the reference's git-clone
`Repository` flow is deprecated upstream). In this offline environment the
staging always works and the upload is gated: without egress + a token the
function returns the ready-to-push local directory, which is also what the
tests pin.
"""

from __future__ import annotations

import logging
import os
import shutil
import uuid
from pathlib import Path
from typing import Optional

logger = logging.getLogger(__name__)

_CARD_TEMPLATE = """---
library_name: s3prl_tpu
tags:
- speech
- s3prl
- s3prl_tpu
- benchmark:superb
{upstream_tag}---

# {repo_name}

Downstream probe trained with **s3prl_tpu** (TPU-native SUPERB framework).

- upstream: `{upstream}`
- problem: `{problem}`
- experiment dir layout: `train/valid_best/params.msgpack` (flax msgpack),
  `config.yaml`, `result.yaml`, TensorBoard events.

## Results

```yaml
{results}
```

## Usage

```python
from s3prl_tpu.train import checkpoint as ckpt
params, _, _ = ckpt.load_checkpoint("model", template_params)
```
"""


def stage_hub_repo(
    expdir: str | os.PathLike,
    upstream: str = "unknown",
    problem: str = "unknown",
    organization: Optional[str] = None,
    repo_name: Optional[str] = None,
) -> Path:
    """Stage `expdir` into `expdir/hf_hub/<repo_name>/` ready for upload.

    Mirrors the reference staging: full artifact copy (minus the hf_hub dir
    itself), dev-best checkpoint renamed to the model.* convention, model
    card generated from the experiment metadata.
    """
    expdir = Path(expdir)
    if repo_name is None:
        # reference convention: <upstream>__<id8> (runner.py:539-544)
        repo_name = f"{upstream.replace('/', '__')}__{str(uuid.uuid4())[:8]}"
    root = expdir / "hf_hub" / repo_name
    if root.exists():
        shutil.rmtree(root)
    root.mkdir(parents=True)

    shutil.copytree(
        expdir, root / "experiment",
        ignore=shutil.ignore_patterns("hf_hub"), dirs_exist_ok=True,
    )

    # dev-best first, newest step dir otherwise (runner.py:573-585 falls
    # back to the final checkpoint when no best exists)
    from . import checkpoint as ckpt

    best = expdir / "train" / "valid_best"
    src = best if best.exists() else ckpt.latest_checkpoint(expdir / "train")
    if src is not None:
        model_dir = root / "model"
        shutil.copytree(src, model_dir)
    else:
        logger.warning("no checkpoint found under %s; staging without model", expdir)

    results = ""
    result_yaml = expdir / "result.yaml"
    if result_yaml.exists():
        results = result_yaml.read_text().strip()
    upstream_tag = f"- upstream:{upstream}\n" if upstream != "unknown" else ""
    (root / "README.md").write_text(
        _CARD_TEMPLATE.format(
            repo_name=repo_name, upstream=upstream, problem=problem,
            results=results or "{}", upstream_tag=upstream_tag,
        )
    )
    return root


def push_to_hub(
    expdir: str | os.PathLike,
    upstream: str = "unknown",
    problem: str = "unknown",
    organization: Optional[str] = None,
    repo_name: Optional[str] = None,
    private: bool = False,
) -> str:
    """Stage and (when possible) upload the experiment to the HF Hub.

    Returns the repo URL when uploaded, else the staged local path with a
    log line explaining what is missing (no egress / no token / no
    huggingface_hub) — the staged directory is complete and can be pushed
    manually with `huggingface-cli upload`.
    """
    root = stage_hub_repo(expdir, upstream, problem, organization, repo_name)
    name = root.name
    repo_id = f"{organization}/{name}" if organization else name

    token = os.environ.get("HF_TOKEN") or os.environ.get("HUGGING_FACE_HUB_TOKEN")
    try:
        from huggingface_hub import HfApi
    except ImportError:
        logger.info(
            "huggingface_hub not installed; staged repo left at %s "
            "(push manually with `huggingface-cli upload %s %s`)",
            root, repo_id, root,
        )
        return str(root)
    if not token:
        logger.info(
            "no HF token (set HF_TOKEN); staged repo left at %s", root
        )
        return str(root)

    api = HfApi(token=token)
    url = api.create_repo(repo_id=repo_id, private=private, exist_ok=True)
    api.upload_folder(repo_id=repo_id, folder_path=str(root))
    logger.info("pushed experiment to %s", url)
    return str(url)
