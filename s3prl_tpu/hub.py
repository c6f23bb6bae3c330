"""Hub facade: `s3prl_tpu.hub.load("hubert")` — analog of s3prl.hub.

The reference exposes every upstream as `getattr(hub, name)(ckpt=...)`
(s3prl/hub.py:40-54); here the registry is explicit (no star-import of
hubconf modules) and `load(name, **kwargs)` returns a ready `Upstream`.
"""

from .upstream.registry import load, options, register  # noqa: F401
