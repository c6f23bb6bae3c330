"""HuBERT — masked-prediction SSL model on the wav2vec2 trunk.

Behavioral spec from the reference's in-house port
(s3prl/upstream/hubert/hubert_model.py: HubertConfig:77, HubertModel:281,
extract_features:566): HuBERT shares the conv extractor + transformer with
wav2vec2 and differs in its pretraining head — a final projection whose
logits are cosine similarities against learned label ("unit") embeddings at
temperature `logit_temp`.

Extraction (the SUPERB path) is exactly the trunk forward; HubertForPretrain
adds the masked-unit prediction head for in-repo pretraining.
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax.numpy as jnp

from .wav2vec2 import BASE, LARGE, Wav2Vec2Config, Wav2Vec2Trunk

# SUPERB-standard configs
HUBERT_BASE = BASE  # 12L/768, group-norm extractor, post-LN, normalize=False
HUBERT_LARGE = LARGE  # 24L/1024, layer-norm extractor, pre-LN, normalize=True


@dataclass(frozen=True)
class HubertPretrainConfig:
    """Pretraining-head hyperparameters (reference: hubert_model.py:77-170)."""

    num_classes: int = 504  # k-means units (100 -> 504 incl. specials)
    final_dim: int = 256
    logit_temp: float = 0.1
    mask_prob: float = 0.8
    mask_length: int = 10


class HubertForPretrain(nn.Module):
    """Trunk + masked-unit prediction head.

    forward returns per-frame logits over the unit vocabulary computed as
    cosine(proj(x), label_emb) / logit_temp (reference: hubert_model.py
    compute_nce + final_proj; the NCE there reduces to CE over these logits).
    """

    cfg: Wav2Vec2Config = HUBERT_BASE
    pre_cfg: HubertPretrainConfig = HubertPretrainConfig()
    dtype: jnp.dtype = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, wavs, wav_lens, mask_indices, deterministic=False):
        """Returns (logits[B, T', num_classes], feat_lens[B])."""
        hidden_states, feat_lens = Wav2Vec2Trunk(
            self.cfg, self.dtype, self.remat, name="trunk"
        )(wavs, wav_lens, mask_indices=mask_indices, deterministic=deterministic)
        x = hidden_states[-1]
        proj = nn.Dense(self.pre_cfg.final_dim, dtype=self.dtype, name="final_proj")(x)
        label_embs = self.param(
            "label_embs",
            nn.initializers.uniform(scale=1.0),
            (self.pre_cfg.num_classes, self.pre_cfg.final_dim),
            jnp.float32,
        ).astype(self.dtype)
        proj = proj / jnp.maximum(
            jnp.linalg.norm(proj, axis=-1, keepdims=True), 1e-8
        )
        emb = label_embs / jnp.maximum(
            jnp.linalg.norm(label_embs, axis=-1, keepdims=True), 1e-8
        )
        logits = jnp.einsum(
            "btd,cd->btc", proj, emb, preferred_element_type=jnp.float32
        ) / self.pre_cfg.logit_temp
        return logits, feat_lens
