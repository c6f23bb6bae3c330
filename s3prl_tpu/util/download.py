"""Checkpoint download cache.

Re-creates the reference's sha256-named, FileLock-guarded download cache
(s3prl/util/download.py:161-207): files land in ``$S3PRL_TPU_CACHE`` (default
``~/.cache/s3prl_tpu/download``) under the sha256 of their URL, downloads are
serialized per-file with a lock so concurrent hosts/processes dedup work, and
an optional hash prefix in the URL fragment is verified after download.
"""

from __future__ import annotations

import hashlib
import logging
import os
import shutil
import tempfile
import urllib.request
from pathlib import Path
from typing import List

from filelock import FileLock

logger = logging.getLogger(__name__)

_CACHE_DIR = None


def set_dir(path) -> None:
    global _CACHE_DIR
    _CACHE_DIR = Path(path)


def get_dir() -> Path:
    if _CACHE_DIR is not None:
        return _CACHE_DIR
    return Path(os.environ.get("S3PRL_TPU_CACHE", Path.home() / ".cache" / "s3prl_tpu")) / "download"


def _sha256(text: str) -> str:
    return hashlib.sha256(text.encode()).hexdigest()


def _file_sha256_prefix(path: Path, nbytes: int = 1 << 20) -> str:
    """sha256 of the first megabyte — cheap integrity spot-check."""
    h = hashlib.sha256()
    with open(path, "rb") as f:
        h.update(f.read(nbytes))
    return h.hexdigest()


def download(url: str, refresh: bool = False) -> Path:
    """Download `url` into the cache, returning the local path.

    A trailing ``#sha256_prefix`` fragment is stripped from the effective URL
    and (if present) asserted against the downloaded file's leading-MB hash.
    """
    url, _, expected_hash = url.partition("#")
    cache = get_dir()
    cache.mkdir(parents=True, exist_ok=True)
    suffix = Path(url).suffix
    target = cache / (_sha256(url) + suffix)
    lock = FileLock(str(target) + ".lock")
    with lock:
        if target.exists() and not refresh:
            return target
        logger.info(f"downloading {url} -> {target}")
        with tempfile.NamedTemporaryFile(dir=cache, delete=False) as tmp:
            with urllib.request.urlopen(url) as resp:
                shutil.copyfileobj(resp, tmp)
            tmp_path = Path(tmp.name)
        if expected_hash:
            got = _file_sha256_prefix(tmp_path)
            if not got.startswith(expected_hash):
                tmp_path.unlink(missing_ok=True)
                raise RuntimeError(f"hash mismatch for {url}: {got} !~ {expected_hash}")
        os.replace(tmp_path, target)
    return target


def urls_to_filepaths(*urls: str, refresh: bool = False) -> List[Path]:
    paths = [download(u, refresh=refresh) if "://" in u else Path(u) for u in urls]
    return paths if len(paths) > 1 else paths[0]
