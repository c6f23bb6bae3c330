"""MR-HuBERT — hourglass (U-net) multi-resolution HuBERT, faithful port.

Behavioral spec from the reference (s3prl/upstream/multires_hubert/
hubert_model.py): conv waveform features -> LayerNorm -> proj -> a U-net of
transformer blocks: `encoders[i]` (pos conv only on the first,
hubert_model.py:462-476) each followed by a down-sampling conv module,
a `middle_encoder` (no pos conv when there are >=1 ratio pairs,
hubert_model.py:400-404) wrapped in a residual (`x = x + middle(x)`,
forward:797-799), then up-sampling conv modules each followed by `decoders[i]`
and an aligned residual add from the matching encoder output (forward:803-812).

Down/up-sampling modules (hubert_model.py:970-1267): ConvAdapter (a
ConvTranspose "numerator" upsample + strided-conv "denominator" downsample,
each with GroupNorm(1, C) + GELU, skip connections at sqrt(0.4), plus a
highway residual) or the plain ConvDownsampler/ConvUpsampler halves.

Hidden-state layout matches the expert's hooks (expert.py:48-101): for each
block, every layer input plus the block output, nearest-neighbor upsampled
(`repeat_interleave`) to the finest label rate and trimmed to the common
min length.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from .convfe import DEFAULT_CONV_LAYERS, ConvFeatureExtractor
from .transformer import TransformerEncoder
from ..ops.masking import length_mask


@dataclass(frozen=True)
class MultiresHubertConfig:
    conv_feature_layers: Tuple[Tuple[int, int, int], ...] = DEFAULT_CONV_LAYERS
    extractor_mode: str = "default"
    conv_bias: bool = False
    encoder_embed_dim: int = 768
    encoder_ffn_embed_dim: int = 3072
    encoder_attention_heads: int = 12
    activation_fn: str = "gelu"
    layer_norm_first: bool = False
    conv_pos: int = 128
    conv_pos_groups: int = 16
    # label_rate_ratios [u1, d1, u2, d2, ...]: pairs of (numerator,
    # denominator) rate changes between resolutions
    label_rate_ratios: Tuple[int, ...] = (1, 2)
    encoder_layers: int = 2  # layers per U-net block (cfg default "2")
    override_encoder_layers: Tuple[int, ...] = ()  # odd-length per-block list
    conv_adapator_kernal: int = 7
    use_plain_updownsample: bool = False
    dropout: float = 0.1
    attention_dropout: float = 0.1
    activation_dropout: float = 0.0
    dropout_input: float = 0.1
    normalize: bool = False

    @property
    def n_pairs(self) -> int:
        return len(self.label_rate_ratios) // 2

    @property
    def block_layers(self) -> Tuple[int, ...]:
        """Per-block layer counts: [enc_0.., middle, dec_0..] (2*n_pairs+1)."""
        if self.override_encoder_layers:
            assert len(self.override_encoder_layers) == 2 * self.n_pairs + 1
            return tuple(self.override_encoder_layers)
        return tuple([self.encoder_layers] * (2 * self.n_pairs + 1))

    @property
    def num_hidden_states(self) -> int:
        return sum(n + 1 for n in self.block_layers)


def _repeat_time(x: jnp.ndarray, factor: int, time_axis: int) -> jnp.ndarray:
    if factor == 1:
        return x
    return jnp.repeat(x, factor, axis=time_axis)


class _GNConv(nn.Module):
    """conv/conv-transpose + GroupNorm(1, C) + GELU (norm_block with
    is_layer_norm=False, wav2vec_model.py:46-56)."""

    channels: int
    kernel: int
    stride: int
    transpose: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # [B, T, C]
        if self.transpose:
            # torch ConvTranspose1d(padding=0, output_padding=stride-1):
            # flax VALID output ((T-1)*s + k) plus (s-1) trailing zeros
            y = nn.ConvTranspose(
                self.channels, (self.kernel,), strides=(self.stride,),
                padding="VALID", use_bias=False, dtype=self.dtype, name="conv",
            )(x)
            if self.stride > 1:
                y = jnp.pad(y, ((0, 0), (0, self.stride - 1), (0, 0)))
        else:
            pad = (self.kernel - 1) // 2
            y = nn.Conv(
                self.channels, (self.kernel,), strides=(self.stride,),
                padding=((pad, pad),), use_bias=False, dtype=self.dtype, name="conv",
            )(x)
        y = nn.GroupNorm(num_groups=1, epsilon=1e-5, dtype=jnp.float32, name="norm")(
            y
        ).astype(self.dtype)
        return nn.gelu(y, approximate=False)


class ConvAdapter(nn.Module):
    """Up-then-down rational resampler (hubert_model.py:970-1092)."""

    channels: int
    kernel: int
    up: int
    down: int
    residual_scale: float = 0.4  # scaled at sqrt()
    highway: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, lens: jnp.ndarray):
        scale = self.residual_scale ** 0.5
        up = _GNConv(self.channels, self.kernel, self.up, transpose=True,
                     dtype=self.dtype, name="upsample_conv")(x)
        res_up = _repeat_time(x, self.up, 1)
        t_up = min(up.shape[1], res_up.shape[1])
        up = (up[:, :t_up] + res_up[:, :t_up]) * scale

        down = _GNConv(self.channels, self.kernel, self.down,
                       dtype=self.dtype, name="downsample_conv")(up)
        res_down = up[:, :: self.down]
        t_down = min(down.shape[1], res_down.shape[1])
        y = (down[:, :t_down] + res_down[:, :t_down]) * scale

        if self.highway:
            res_hw = res_up[:, :: self.down]
            t = min(y.shape[1], res_hw.shape[1])
            y = (y[:, :t] + res_hw[:, :t]) * scale

        lens = -(-(lens * self.up) // self.down)
        lens = jnp.minimum(lens, y.shape[1])
        return y, lens


class ConvDownsampler(nn.Module):
    """Plain downsample half (hubert_model.py:1095-1178)."""

    channels: int
    kernel: int
    down: int
    residual_scale: float = 0.4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, lens: jnp.ndarray):
        scale = self.residual_scale ** 0.5
        down = _GNConv(self.channels, self.kernel, self.down,
                       dtype=self.dtype, name="downsample_conv")(x)
        res = x[:, :: self.down]
        t = min(down.shape[1], res.shape[1])
        y = (down[:, :t] + res[:, :t]) * scale
        lens = jnp.minimum(-(-lens // self.down), y.shape[1])
        return y, lens


class ConvUpsampler(nn.Module):
    """Plain upsample half (hubert_model.py:1181-1267)."""

    channels: int
    kernel: int
    up: int
    residual_scale: float = 0.4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, lens: jnp.ndarray):
        scale = self.residual_scale ** 0.5
        upd = _GNConv(self.channels, self.kernel, self.up, transpose=True,
                      dtype=self.dtype, name="upsample_conv")(x)
        res = _repeat_time(x, self.up, 1)
        t = min(upd.shape[1], res.shape[1])
        y = (upd[:, :t] + res[:, :t]) * scale
        lens = jnp.minimum(lens * self.up, y.shape[1])
        return y, lens


class MultiresHubertModel(nn.Module):
    cfg: MultiresHubertConfig = MultiresHubertConfig()
    dtype: jnp.dtype = jnp.float32

    def _encoder(self, name, layers, pos_conv):
        cfg = self.cfg
        return TransformerEncoder(
            embed_dim=cfg.encoder_embed_dim, ffn_dim=cfg.encoder_ffn_embed_dim,
            num_layers=layers, num_heads=cfg.encoder_attention_heads,
            layer_norm_first=cfg.layer_norm_first, dropout=cfg.dropout,
            activation_dropout=cfg.activation_dropout,
            attention_dropout=cfg.attention_dropout, activation=cfg.activation_fn,
            conv_pos=cfg.conv_pos, conv_pos_groups=cfg.conv_pos_groups,
            use_pos_conv=pos_conv, dtype=self.dtype, name=name,
        )

    @nn.compact
    def __call__(self, wavs, wav_lens, deterministic: bool = True):
        cfg = self.cfg
        if cfg.normalize:
            from .wav2vec2 import normalize_wavs

            wavs = normalize_wavs(wavs, wav_lens)
        feat = ConvFeatureExtractor(
            cfg.conv_feature_layers, cfg.extractor_mode, cfg.conv_bias, self.dtype,
            name="feature_extractor",
        )(wavs, train=not deterministic)
        t_feat = feat.shape[1]
        r = max(wavs.shape[1] // max(t_feat, 1), 1)
        lens = jnp.minimum(-(-wav_lens // r), t_feat)

        feat = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="layer_norm")(feat)
        x = feat.astype(self.dtype)
        embed = cfg.conv_feature_layers[-1][0]
        if embed != cfg.encoder_embed_dim:
            x = nn.Dense(cfg.encoder_embed_dim, dtype=self.dtype,
                         name="post_extract_proj")(x)
        x = nn.Dropout(cfg.dropout_input)(x, deterministic=deterministic)

        pairs = [
            (cfg.label_rate_ratios[2 * i], cfg.label_rate_ratios[2 * i + 1])
            for i in range(cfg.n_pairs)
        ]
        blocks = cfg.block_layers
        k = cfg.conv_adapator_kernal
        C = cfg.encoder_embed_dim

        # cumulative upsample factor of each resolution back to the finest
        res_factor = [1]
        for (u, d) in pairs:
            res_factor.append(res_factor[-1] * d // u)

        all_states = []  # (hidden[B, T_i, C], factor to finest rate)
        residuals = []
        # encoder (downward) path
        for i, (u, d) in enumerate(pairs):
            pad = ~length_mask(lens, x.shape[1])
            _, hs = self._encoder(f"encoders_{i}", blocks[i], pos_conv=(i == 0))(
                x, pad, deterministic=deterministic
            )
            x = hs[-1]
            all_states.extend((hs[j], res_factor[i]) for j in range(hs.shape[0]))
            residuals.append((x, lens))
            if cfg.use_plain_updownsample:
                assert u == 1, "plain downsampler requires unit numerator"
                x, lens = ConvDownsampler(C, k, d, dtype=self.dtype,
                                          name=f"downsample_{i}")(x, lens)
            else:
                x, lens = ConvAdapter(C, k, u, d, dtype=self.dtype,
                                      name=f"downsample_{i}")(x, lens)

        # middle encoder with hourglass residual (forward:797-799). The
        # reference zeroes padded positions of x *in place* inside the
        # encoder (wav2vec2_model.py extract_features), so the residual add
        # below sees the zeroed x — replicate that before the call.
        pad = ~length_mask(lens, x.shape[1])
        x = jnp.where(pad[..., None], 0.0, x)
        _, hs_mid = self._encoder(
            "middle_encoder", blocks[cfg.n_pairs], pos_conv=(cfg.n_pairs == 0)
        )(x, pad, deterministic=deterministic)
        all_states.extend(
            (hs_mid[j], res_factor[-1]) for j in range(hs_mid.shape[0])
        )
        x = x + hs_mid[-1]

        # decoder (upward) path — upsample module i reverses pair i
        # (init:477-496) and consumes the reversed residual list (forward:805)
        for i in range(cfg.n_pairs):
            u, d = pairs[i]
            if cfg.use_plain_updownsample:
                x, lens = ConvUpsampler(C, k, d, dtype=self.dtype,
                                        name=f"upsample_{i}")(x, lens)
            else:
                x, lens = ConvAdapter(C, k, d, u, dtype=self.dtype,
                                      name=f"upsample_{i}")(x, lens)
            pad = ~length_mask(lens, x.shape[1])
            _, hs_dec = self._encoder(
                f"decoders_{i}", blocks[cfg.n_pairs + 1 + i], pos_conv=False
            )(x, pad, deterministic=deterministic)
            x = hs_dec[-1]
            factor = res_factor[cfg.n_pairs - 1 - i]
            all_states.extend((hs_dec[j], factor) for j in range(hs_dec.shape[0]))
            # aligned residual from the matching encoder output (forward:810)
            res_x, res_lens = residuals[cfg.n_pairs - 1 - i]
            common = min(x.shape[1], res_x.shape[1])
            x = x[:, :common] + res_x[:, :common]
            lens = jnp.minimum(jnp.minimum(lens, res_lens), common)

        # assemble: upsample every state to the finest rate, trim to min len
        upsampled = [_repeat_time(h, f, 1) for h, f in all_states]
        t_min = min(h.shape[1] for h in upsampled)
        hidden_states = jnp.stack([h[:, :t_min] for h in upsampled])
        out_lens = jnp.minimum(lens, t_min)
        return hidden_states, out_lens
