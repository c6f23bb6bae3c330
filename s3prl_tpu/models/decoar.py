"""DeCoAR 1 — bidirectional 4-layer LSTM stacks over fbank.

Behavioral spec from the reference (s3prl/upstream/decoar/decoar.py:10-82 and
s3prl/upstream/decoar_layers/decoar.py:10-98): kaldi fbank-80 + CMVN ->
Dense(1024) -> four forward LSTM layers and four backward LSTM layers (the
backward stack consumes the sequence reversed within its valid length and is
un-reversed afterwards, decoar.py:40-45 flipBatch).

Two exposure variants:
- decoar: one hidden state, concat of the final forward/backward outputs;
- decoar_layers: four hidden states, concat per layer
  (decoar_layers/decoar.py:86-97).
The torch LSTM stacks are chained identically in both (a single nn.LSTM with
num_layers=4 vs a ModuleList of 4 single-layer LSTMs — same math, different
state_dict naming handled in upstream/convert.py).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class DecoarModel(nn.Module):
    per_layer: bool = False  # decoar_layers variant
    hidden: int = 1024
    num_layers: int = 4

    @nn.compact
    def __call__(self, feats: jnp.ndarray, feat_lens: jnp.ndarray, train: bool = False):
        """feats[B, T, 80] -> (hidden_states[L, B, T, 2048], feat_lens)."""
        x = nn.Dense(self.hidden, name="post_extract_proj")(feats)
        fwd, bwd = x, x
        states = []
        for i in range(self.num_layers):
            fwd = nn.RNN(nn.OptimizedLSTMCell(self.hidden, name=f"fwd_{i}"))(
                fwd, seq_lengths=feat_lens
            )
            bwd = nn.RNN(
                nn.OptimizedLSTMCell(self.hidden, name=f"bwd_{i}"),
                reverse=True,
                keep_order=True,
            )(bwd, seq_lengths=feat_lens)
            states.append(jnp.concatenate([fwd, bwd], axis=-1))
        if self.per_layer:
            return jnp.stack(states), feat_lens
        return states[-1][None], feat_lens
