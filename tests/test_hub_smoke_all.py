"""All-entries hub smoke sweep (VERDICT r2 missing #2).

The reference's flagship test drives every hub entry through a real forward
(test/test_upstream.py:85-136). `tests/test_hub_name_parity.py` proves the
name *set* matches; this sweep proves every factory actually CONSTRUCTS and
the resulting upstream FORWARDS — a broken factory (bad config plumb, import
error, shape bug) can no longer pass CI.

Cost is bounded by deduping forwards across aliases: entries that build the
same (class, num_layers, hidden size, param count) trunk forward once
(`hubert` == `hubert_base` == `contentvec` etc.); every entry still runs its
own factory + init. Marked slow: ~148 constructions.
"""

import gc

import numpy as np
import pytest

import jax

from s3prl_tpu import hub

#: generic loaders that require a ckpt/source argument by design — the
#: reference's `options(only_registered_ckpt=True)` filters the same classes
#: of names (s3prl/hub.py:40-54)
ARG_REQUIRED_SUFFIXES = ("_local", "_url", "_custom", "_gdriveid")

#: entries that wrap an external package in the reference too and are
#: registered here as informative stubs (none left as of round 5:
#: pase_plus is native, models/pase.py)
EXTERNAL_STUBS = set()

#: entries whose factory needs an explicit source even without a suffix
NEEDS_SOURCE = {"customized_upstream"}


def _zero_arg_names():
    return [
        n
        for n in hub.options()
        if not n.endswith(ARG_REQUIRED_SUFFIXES)
        and n not in EXTERNAL_STUBS
        and n not in NEEDS_SOURCE
    ]


@pytest.mark.slow
def test_every_zero_arg_hub_entry_constructs_and_forwards():
    rng = np.random.RandomState(0)
    wav = rng.randn(1, 16000).astype(np.float32)  # 1 s
    lens = np.asarray([16000], np.int32)

    forwarded = {}
    failures = []
    for name in _zero_arg_names():
        try:
            up = hub.load(name)
            n_params = sum(
                int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(up.params)
            )
            key = (type(up).__name__, up.num_layers, n_params)
            if key not in forwarded:
                hs, h_lens = up.apply_standardized(up.params, wav, lens)
                leading = np.asarray(hs[0] if isinstance(hs, (list, tuple)) else hs)
                assert np.all(np.isfinite(leading)), f"{name}: non-finite states"
                forwarded[key] = name
        except Exception as e:  # noqa: BLE001 — collect every broken factory
            failures.append(f"{name}: {type(e).__name__}: {e}")
        finally:
            gc.collect()

    assert not failures, "broken hub factories:\n" + "\n".join(failures)
    # sanity: dedupe actually shared trunks across aliases
    assert len(forwarded) < len(_zero_arg_names())


def test_pase_plus_ckpt_conversion_gated():
    """pase_plus is native (models/pase.py); only its checkpoint conversion
    remains egress-gated and must say so rather than load garbage."""
    with pytest.raises(NotImplementedError, match="egress|pase"):
        hub.load("pase_plus", ckpt="/tmp/nonexistent.ckpt")
