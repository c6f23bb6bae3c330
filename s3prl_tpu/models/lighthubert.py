"""LightHuBERT — once-for-all HuBERT supernet, native subnet extraction.

Behavioral spec from the reference's vendored supernet
(s3prl/upstream/lighthubert/lighthubert/):
- lighthubert.py:431-828: conv features -> LayerNorm(512) -> sliced
  post_extract_proj -> STransformerEncoder (post-LN wav2vec2 layers, pos conv,
  pre-layer LayerNorm when layer_norm_first=False); hidden_states =
  [projected features (pre pos-conv)] + every layer output
  (forward:771-773);
- the expert (expert.py:14-72) always layer-norms each input wav and picks a
  FIXED subnet at load: `supernet.subnet` for pruner ckpts (base: 640 dim /
  10 heads / 2560 ffn; small: 384/6/1536 — lighthubert.py:219-240) or
  `max_subnet` for distilled students;
- every scaling module samples a weight PREFIX (scaling_linear.py:76-103,
  scaling_conv.py:52-63), so a fixed subnet is exactly a standard trunk with
  host-side sliced weights — which is how upstream/convert.py builds it. The
  attention head dim stays 64 (scaling_multihead.py:156-158).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from .convfe import DEFAULT_CONV_LAYERS, ConvFeatureExtractor
from .transformer import TransformerEncoder
from .wav2vec2 import normalize_wavs
from ..ops.masking import length_mask

# published subnets (lighthubert.py:219-240 / 255-275)
SUBNET_BASE = {"embed_dim": 640, "heads_num": 10, "ffn_embed": 2560, "layer_num": 12}
SUBNET_SMALL = {"embed_dim": 384, "heads_num": 6, "ffn_embed": 1536, "layer_num": 12}
SUBNET_BASE_MAX = {"embed_dim": 768, "heads_num": 12, "ffn_embed": 3072, "layer_num": 12}
SUBNET_SMALL_MAX = {"embed_dim": 512, "heads_num": 8, "ffn_embed": 2048, "layer_num": 12}


@dataclass(frozen=True)
class LightHubertConfig:
    conv_feature_layers: Tuple[Tuple[int, int, int], ...] = DEFAULT_CONV_LAYERS
    extractor_mode: str = "layer_norm"
    conv_bias: bool = False
    embed_dim: int = 640
    num_heads: int = 10
    ffn_dim: int = 2560
    num_layers: int = 12
    conv_pos: int = 128
    conv_pos_groups: int = 16
    layer_norm_first: bool = False


class LightHubertModel(nn.Module):
    cfg: LightHubertConfig = LightHubertConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, wavs, wav_lens, deterministic: bool = True):
        """Returns (hidden_states[L+1, B, T', E], feat_lens).

        hidden_states[0] is the projected feature sequence (pre pos-conv);
        hidden_states[1:] are the L layer outputs — the reference layout
        (lighthubert.py:771-773), which differs from hubert's layer-inputs.
        """
        cfg = self.cfg
        # the expert always F.layer_norm's each wav (expert.py:55)
        wavs = normalize_wavs(wavs, wav_lens)
        feat = ConvFeatureExtractor(
            cfg.conv_feature_layers, cfg.extractor_mode, cfg.conv_bias, self.dtype,
            name="feature_extractor",
        )(wavs, train=not deterministic)
        t_feat = feat.shape[1]
        r = max(wavs.shape[1] // max(t_feat, 1), 1)
        feat_lens = jnp.minimum(-(-wav_lens // r), t_feat)

        feat = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="layer_norm")(feat)
        x = nn.Dense(cfg.embed_dim, dtype=self.dtype, name="post_extract_proj")(
            feat.astype(self.dtype)
        )
        features = x  # hidden_states[0]

        pad = ~length_mask(feat_lens, t_feat)
        _, hs = TransformerEncoder(
            embed_dim=cfg.embed_dim, ffn_dim=cfg.ffn_dim, num_layers=cfg.num_layers,
            num_heads=cfg.num_heads, layer_norm_first=cfg.layer_norm_first,
            dropout=0.0, attention_dropout=0.0, conv_pos=cfg.conv_pos,
            conv_pos_groups=cfg.conv_pos_groups, dtype=self.dtype, name="encoder",
        )(x, pad, deterministic=deterministic)
        # hs = [layer inputs 0..L-1, final]; layer input i+1 == layer output i,
        # so [features] + hs[1:] is exactly [features] + all layer outputs
        hidden_states = jnp.concatenate([features[None], hs[1:]], axis=0)
        return hidden_states, feat_lens
