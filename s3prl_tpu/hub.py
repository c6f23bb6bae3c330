"""Hub facade: `s3prl_tpu.hub.load("hubert")` — analog of s3prl.hub.

The reference exposes every upstream as `getattr(hub, name)(ckpt=...)`
(s3prl/hub.py:40-54); here the registry is explicit (no star-import of
hubconf modules), `load(name, **kwargs)` returns a ready `Upstream`, and
module-level `__getattr__` keeps the reference's attribute surface working:
`hub.hubert(ckpt=...)` == `hub.load("hubert", ckpt=...)`.
"""

import functools

from .upstream.registry import load, options, register  # noqa: F401


def __getattr__(name):
    if name.startswith("_") or name not in options():
        raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
    return functools.partial(load, name)


def __dir__():
    return sorted(set(globals()) | set(options()))
