"""wav2vec 2.0 trunk — the shared conv-encoder + transformer architecture.

Behavioral spec from the reference's fairseq-free port
(s3prl/upstream/wav2vec2/wav2vec2_model.py: Wav2Vec2Config:2104,
Wav2Vec2Model:2353, extract_features:2815): waveform -> strided conv features
-> fp32 LayerNorm -> optional projection to encoder dim -> optional span
masking with a learned mask embedding -> conv-pos-emb transformer.

This trunk is shared by wav2vec2, HuBERT (hubert.py), and their Large
variants; per-layer hidden states come back as a stacked [L+1, B, T, C] array
(see transformer.py for the capture layout).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .convfe import (
    DEFAULT_CONV_LAYERS,
    ConvFeatureExtractor,
    conv_output_lengths,
    total_stride,
)
from .transformer import TransformerEncoder
from ..ops.masking import length_mask


@dataclass(frozen=True)
class Wav2Vec2Config:
    """Architecture hyperparameters (reference: wav2vec2_model.py:2104)."""

    extractor_mode: str = "default"  # "default" (Base) | "layer_norm" (Large)
    conv_feature_layers: Tuple[Tuple[int, int, int], ...] = DEFAULT_CONV_LAYERS
    conv_bias: bool = False
    encoder_layers: int = 12
    encoder_embed_dim: int = 768
    encoder_ffn_embed_dim: int = 3072
    encoder_attention_heads: int = 12
    activation_fn: str = "gelu"
    layer_norm_first: bool = False
    conv_pos: int = 128
    conv_pos_groups: int = 16
    pos_conv_depth: int = 1
    dropout: float = 0.1
    attention_dropout: float = 0.1
    activation_dropout: float = 0.0
    dropout_input: float = 0.1
    encoder_layerdrop: float = 0.0
    layer_type: str = "transformer"  # "transformer" | "conformer"
    pos_enc_type: str = "rel_pos"  # conformer positions: "abs"|"rel_pos"|"rope"
    depthwise_conv_kernel_size: int = 31
    # data2vec variants: projection exists even at equal dims, and the
    # feature padding mask uses strict conv arithmetic instead of hubert's
    # block-folded rule (data2vec_model.py:247, 457-470)
    post_extract_proj_always: bool = False
    feat_pad_rule: str = "block"  # "block" (hubert) | "conv" (data2vec)
    # wave normalization (fairseq task cfg `normalize`; True for Large models)
    normalize: bool = False

    @property
    def downsample_rate(self) -> int:
        return total_stride(self.conv_feature_layers)


BASE = Wav2Vec2Config()
LARGE = Wav2Vec2Config(
    extractor_mode="layer_norm",
    encoder_layers=24,
    encoder_embed_dim=1024,
    encoder_ffn_embed_dim=4096,
    encoder_attention_heads=16,
    layer_norm_first=True,
    dropout=0.0,
    attention_dropout=0.0,
    normalize=True,
)


def normalize_wavs(wavs: jnp.ndarray, wav_lens: jnp.ndarray) -> jnp.ndarray:
    """Per-utterance zero-mean unit-var over valid samples.

    The reference layer-norms each unpadded wav (hubert/expert.py:57-58
    `F.layer_norm(wav, wav.shape)`); on padded batches this is a masked
    mean/var (biased, eps=1e-5 like torch layer_norm).
    """
    B, T = wavs.shape
    mask = length_mask(wav_lens, T, wavs.dtype)
    denom = jnp.maximum(wav_lens.astype(wavs.dtype), 1.0)[:, None]
    mean = jnp.sum(wavs * mask, axis=1, keepdims=True) / denom
    var = jnp.sum(jnp.where(mask > 0, (wavs - mean) ** 2, 0.0), axis=1, keepdims=True) / denom
    out = (wavs - mean) / jnp.sqrt(var + 1e-5)
    return out * mask


class Wav2Vec2Trunk(nn.Module):
    """Conv features -> LayerNorm -> proj -> (mask) -> transformer."""

    cfg: Wav2Vec2Config = BASE
    dtype: jnp.dtype = jnp.float32
    remat: bool = False
    use_flash: bool = False  # Pallas fused attention (forward-only paths)
    quantize: bool = False  # int8 W8A8 encoder projections (serving)

    @nn.compact
    def __call__(
        self,
        wavs: jnp.ndarray,  # [B, T] raw 16 kHz, padded
        wav_lens: jnp.ndarray,  # [B]
        mask_indices: Optional[jnp.ndarray] = None,  # [B, T'] bool, True = mask
        deterministic: bool = True,
        layer_weights: Optional[jnp.ndarray] = None,  # fused weighted-sum path
    ):
        """Returns (hidden_states[L+1, B, T', C], feat_lens[B]); with
        layer_weights, hidden_states is the fused weighted sum [1, B, T', C]
        (see TransformerEncoder)."""
        cfg = self.cfg
        if cfg.normalize:
            wavs = normalize_wavs(wavs, wav_lens)
        features = ConvFeatureExtractor(
            cfg.conv_feature_layers, cfg.extractor_mode, cfg.conv_bias, self.dtype,
            quantize=self.quantize, name="feature_extractor",
        )(wavs, train=not deterministic)
        # The reference derives the feature-level padding mask by folding the
        # wav-level mask into blocks of r = T_wav // T_feat samples and
        # marking a frame padded only when ALL its samples are padded
        # (hubert_model.py:459-469 forward_padding_mask) — i.e.
        # ceil(wav_len / r) valid frames, one more than strict conv
        # arithmetic near the boundary. Replicated exactly for parity.
        t_feat = features.shape[1]
        if cfg.feat_pad_rule == "conv":
            feat_lens = jnp.minimum(
                conv_output_lengths(wav_lens, cfg.conv_feature_layers), t_feat
            )
        else:
            r = max(wavs.shape[1] // max(t_feat, 1), 1)
            feat_lens = jnp.minimum(-(-wav_lens // r), t_feat)

        features = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="layer_norm")(features)
        features = features.astype(self.dtype)
        embed = cfg.conv_feature_layers[-1][0]
        if cfg.post_extract_proj_always or embed != cfg.encoder_embed_dim:
            features = nn.Dense(
                cfg.encoder_embed_dim, dtype=self.dtype, name="post_extract_proj"
            )(features)
        features = nn.Dropout(cfg.dropout_input)(features, deterministic=deterministic)

        # created unconditionally so the param tree is independent of whether
        # this call masks (ckpt compatibility between pretrain and extraction)
        mask_emb = self.param(
            "mask_emb",
            nn.initializers.uniform(scale=1.0),
            (cfg.encoder_embed_dim,),
            jnp.float32,
        )
        if mask_indices is not None:
            # tolerate off-by-a-few length mismatch between an externally
            # computed mask (e.g. from unit-label length) and conv output
            t = features.shape[1]
            if mask_indices.shape[1] < t:
                mask_indices = jnp.pad(
                    mask_indices, ((0, 0), (0, t - mask_indices.shape[1]))
                )
            elif mask_indices.shape[1] > t:
                mask_indices = mask_indices[:, :t]
            features = jnp.where(
                mask_indices[..., None], mask_emb.astype(self.dtype), features
            )

        padding_mask = ~length_mask(feat_lens, features.shape[1])
        _, hidden_states = TransformerEncoder(
            embed_dim=cfg.encoder_embed_dim,
            ffn_dim=cfg.encoder_ffn_embed_dim,
            num_layers=cfg.encoder_layers,
            num_heads=cfg.encoder_attention_heads,
            layer_norm_first=cfg.layer_norm_first,
            dropout=cfg.dropout,
            activation_dropout=cfg.activation_dropout,
            attention_dropout=cfg.attention_dropout,
            activation=cfg.activation_fn,
            conv_pos=cfg.conv_pos,
            conv_pos_groups=cfg.conv_pos_groups,
            pos_conv_depth=cfg.pos_conv_depth,
            layerdrop=cfg.encoder_layerdrop,
            layer_type=cfg.layer_type,
            pos_enc_type=cfg.pos_enc_type,
            depthwise_conv_kernel_size=cfg.depthwise_conv_kernel_size,
            remat=self.remat,
            use_flash=self.use_flash,
            quantize=self.quantize,
            dtype=self.dtype,
            name="encoder",
        )(features, padding_mask, deterministic=deterministic,
          layer_weights=layer_weights)
        return hidden_states, feat_lens
