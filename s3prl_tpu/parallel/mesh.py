"""Device mesh + sharding layout.

The TPU-native replacement for the reference's NCCL DDP stack
(run_downstream.py:166-168, runner.py:112-117, DistributedBatchSamplerWrapper):
one 2-D mesh with axes ("dp", "tp") — batch sharded over `dp` (gradients
reduced by XLA psum, replacing DDP allreduce), optional Megatron-style tensor
parallelism over `tp` for >1B upstreams (attention heads / FFN sharded
column-then-row so GSPMD inserts a single all-reduce per block).

Everything routes through `jax.sharding.NamedSharding`; under
`jax.jit(..., in_shardings=..., out_shardings=...)` XLA GSPMD lays the
collectives on ICI. On one device the same code path runs unsharded — the
reference's "world_size=1 is the same code" property (SURVEY §2.10).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    dp: Optional[int] = None,
    tp: int = 1,
    sp: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Create a ("dp", "tp"[, "sp"]) mesh over the given (default: all)
    devices. The "sp" axis (sequence parallelism: the TIME axis of waveforms
    and hidden states sharded across devices — capability the reference
    lacks entirely, SURVEY §5.7) is only added when sp > 1 so every dp/tp
    path is unchanged."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp is None:
        assert n % (tp * sp) == 0, (n, tp, sp)
        dp = n // (tp * sp)
    assert dp * tp * sp == n, f"dp({dp}) * tp({tp}) * sp({sp}) != {n} devices"
    if sp > 1:
        return Mesh(np.asarray(devices).reshape(dp, tp, sp), ("dp", "tp", "sp"))
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))


def sequence_sharding(mesh: Mesh) -> NamedSharding:
    """wavs [B, T]: batch over dp, TIME over sp (long-audio extraction)."""
    return NamedSharding(mesh, P("dp", "sp"))


def sequence_sharded_extraction(upstream, mesh: Mesh, wavs, lens):
    """Hidden-state extraction with the time axis sharded over the mesh's
    "sp" axis: per-device wav shards stream through the conv front end with
    GSPMD halo exchange, attention all-gathers K/V over ICI, and the
    returned hidden states stay time-sharded ([L, B, T', C] with T' over
    "sp") — minutes-long diarization audio no single chip could hold.
    Numerics match single-device extraction exactly (tests/test_parallel.py).
    """
    ws = jax.device_put(wavs, sequence_sharding(mesh))
    ls = jax.device_put(lens, NamedSharding(mesh, P("dp")))
    params = jax.device_put(upstream.params, NamedSharding(mesh, P()))
    # no out_shardings pin: the feature frame count (T-1)//320+1 is rarely
    # divisible by sp, so GSPMD chooses the output layout (T-sharded with a
    # ragged last shard where it can)
    with mesh:
        return jax.jit(upstream.apply_standardized)(params, ws, ls)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis over dp, replicated over tp."""
    return NamedSharding(mesh, P("dp"))


def replicate_to_mesh(mesh: Mesh, tree: Any) -> Any:
    """Fully replicate a pytree across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


# parameter-name fragments -> PartitionSpec for the trunk's big matmuls.
# Column-parallel (shard output dim) for qkv/fc1, row-parallel (shard input
# dim) for out_proj/fc2; scanned layers carry a leading L axis.
#
# WavLM's gated rel-pos bias (models/wavlm.py GatedRelPosLayer, reference
# modules.py:389-470) is an EXPLICIT replicate decision, not an omission:
# `grep_linear` ([Dh, 8]) and `grep_a` ([1, H, 1, 1]) are O(C*8) params doing
# <0.1% of a block's FLOPs on the *replicated* layer input, and the bucketed
# bias table `rel_attn_embed` ([num_buckets, H]) is shared across layers.
# Sharding them over tp would save nothing and force GSPMD to all-gather the
# per-(head, query) gate inside every attention; replicated, GSPMD partitions
# the gate math per head on demand where the qkv heads are already sharded.
# tp=2 vs tp=1 numerics for both trunks: tests/test_parallel.py.
_TP_RULES = (
    (("self_attn", "qkv", "kernel"), P(None, None, "tp")),
    (("self_attn", "qkv", "bias"), P(None, "tp")),
    (("self_attn", "out_proj", "kernel"), P(None, "tp", None)),
    (("fc1", "kernel"), P(None, None, "tp")),
    (("fc1", "bias"), P(None, "tp")),
    (("fc2", "kernel"), P(None, "tp", None)),
)


def _path_names(path) -> tuple:
    return tuple(getattr(p, "key", getattr(p, "name", str(p))) for p in path)


def param_shardings(mesh: Mesh, params: Any, tp_rules=_TP_RULES) -> Any:
    """NamedSharding tree: TP rules on matched paths, replicate the rest."""

    def spec_for(path) -> P:
        names = _path_names(path)
        if mesh.shape.get("tp", 1) > 1:
            for frag, spec in tp_rules:
                if len(names) >= len(frag) and tuple(names[-len(frag):]) == frag:
                    return spec
        return P()

    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, spec_for(path)), params
    )


def shard_params(mesh: Mesh, params: Any) -> Any:
    """Place params on the mesh according to `param_shardings`."""
    return jax.device_put(params, param_shardings(mesh, params))
