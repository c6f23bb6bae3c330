"""NPC — non-autoregressive predictive coding with masked convolutions.

Behavioral spec from the reference (s3prl/upstream/npc/npc.py:21-260): a
stack of ConvBlocks (conv3 + bn + act + 1x1 + bn + dropout + residual),
each followed by a MaskConvBlock whose kernel has a zeroed center band
(growing by 2 per depth) so the representation at t never sees frames
within +-mask_size/2 of t; the masked features from all levels are summed
and a linear postnet reconstructs the (unseen) center frame.

TPU note: the center-band mask multiplies the kernel at trace time — XLA
sees an ordinary dense conv; BatchNorm uses flax's running-average
batch_stats collection.
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class NPCConfig:
    input_size: int = 80
    hidden_size: int = 512
    n_blocks: int = 4
    dropout: float = 0.1
    residual: bool = True
    kernel_size: int = 15  # odd
    mask_size: int = 5  # odd
    batch_norm: bool = True
    activate: str = "relu"
    disable_cross_layer: bool = False


class ConvBlock(nn.Module):
    hidden_size: int
    residual: bool
    dropout: float
    batch_norm: bool
    activate: str

    @nn.compact
    def __call__(self, x, train: bool = False):
        act = nn.relu if self.activate == "relu" else nn.tanh
        res = x
        out = nn.Conv(self.hidden_size, kernel_size=(3,), padding=1, name="conv")(x)
        if self.batch_norm:
            out = nn.BatchNorm(use_running_average=not train, name="bn1")(out)
        out = act(out)
        out = nn.Conv(self.hidden_size, kernel_size=(1,), name="linear")(out)
        if self.batch_norm:
            out = nn.BatchNorm(use_running_average=not train, name="bn2")(out)
        out = nn.Dropout(self.dropout)(out, deterministic=not train)
        if self.residual and res.shape[-1] == out.shape[-1]:
            out = out + res
        return act(out)


class MaskConvBlock(nn.Module):
    hidden_size: int
    kernel_size: int
    mask_size: int

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        head = (k - self.mask_size) // 2
        mask = np.ones((k, 1, 1), np.float32)
        mask[head : head + self.mask_size] = 0.0
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (k, x.shape[-1], self.hidden_size),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.hidden_size,))
        pad = (k - 1) // 2
        import jax

        out = jax.lax.conv_general_dilated(
            jnp.pad(x, ((0, 0), (pad, pad), (0, 0))),
            kernel * jnp.asarray(mask),
            window_strides=(1,),
            padding="VALID",
            dimension_numbers=("NWC", "WIO", "NWC"),
        ) + bias
        return nn.tanh(out)


class NPCModel(nn.Module):
    cfg: NPCConfig = NPCConfig()

    @nn.compact
    def __call__(self, feats: jnp.ndarray, feat_lens: jnp.ndarray, train: bool = False):
        """Returns (hiddens[2N+1, B, T, H], pred, lens) — the reference
        expert's hook layout (npc/expert.py:28-40): every ConvBlock output,
        every MaskConvBlock output, then the final aggregated feature."""
        cfg = self.cfg
        x = feats
        agg = None
        block_outs, masked_outs = [], []
        mask_size = cfg.mask_size
        for i in range(cfg.n_blocks):
            x = ConvBlock(
                cfg.hidden_size, cfg.residual and i > 0, cfg.dropout,
                cfg.batch_norm, cfg.activate, name=f"block_{i}",
            )(x, train=train)
            block_outs.append(x)
            mask_size += 2
            if cfg.disable_cross_layer and i != cfg.n_blocks - 1:
                continue
            masked = MaskConvBlock(
                cfg.hidden_size, cfg.kernel_size, mask_size, name=f"masked_conv_{i}"
            )(x)
            masked_outs.append(masked)
            agg = masked if agg is None else agg + masked
        pred = nn.Dense(cfg.input_size, name="postnet")(agg)
        hiddens = jnp.stack(block_outs + masked_outs + [agg])
        return hiddens, pred, feat_lens
