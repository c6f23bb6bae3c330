"""Speech translation task (SUPERB-SG ST).

Behavioral spec from the reference (s3prl/downstream/speech_translation —
fairseq S2T encoder-decoder trained with label-smoothed CE, scored with
sacrebleu): here the decoder is the first-party TransformerDecoder over
featurized upstream states; training is teacher-forced CE, evaluation runs
greedy decoding and reports corpus BLEU (metric/bleu.py).
"""

from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .base import Task
from ..metric.bleu import corpus_bleu
from ..ops.masking import length_mask


class SpeechTranslationTask(Task):
    def __init__(self, encoder_module, decoder_module, tokenizer, max_decode_len: int = 128,
                 label_smoothing: float = 0.1):
        self.module = encoder_module  # (hs, h_lens) -> (memory, lens)
        self.decoder = decoder_module
        self.tokenizer = tokenizer
        self.max_decode_len = max_decode_len
        self.label_smoothing = label_smoothing
        self.host_keys = ("labels", "unique_name")

    valid_metric = "bleu"
    valid_higher_better = True

    def init_params(self, key, hs, h_lens, batch):
        k1, k2 = jax.random.split(key)
        enc_params = self.module.init(k1, hs, h_lens)["params"]
        memory, lens = self.module.apply({"params": enc_params}, hs, h_lens)
        tokens = jnp.zeros((hs.shape[1], 4), jnp.int32)
        dec_params = self.decoder.init(k2, tokens, memory, lens)["params"]
        return {"encoder": enc_params, "decoder": dec_params}

    def _forward(self, params, hs, h_lens, tokens, rng, train):
        memory, lens = self.module.apply(
            {"params": params["encoder"]}, hs, h_lens, train=train,
            rngs={"dropout": rng} if train else None,
        )
        logits = self.decoder.apply(
            {"params": params["decoder"]}, tokens, memory, lens,
            deterministic=not train, rngs={"dropout": rng} if train else None,
        )
        return logits, memory, lens

    def loss_and_cache(self, params, hs, h_lens, batch, rng, train):
        raw = batch["class_ids"]  # [B, N], pad=0
        raw_lens = batch["class_ids_len"]
        eos = self.tokenizer.eos_idx
        B, N = raw.shape
        # append <eos> at each target's end: the decoder must LEARN to stop,
        # or greedy decoding rambles to max_decode_len (caught by the ST
        # convergence run — train loss fell to the smoothed-CE floor while
        # test BLEU stayed ~2 because hypotheses never terminated)
        targets = jnp.concatenate([raw, jnp.zeros((B, 1), raw.dtype)], 1)
        pos = jnp.arange(N + 1)[None, :]
        targets = jnp.where(pos == raw_lens[:, None], eos, targets)
        target_lens = raw_lens + 1
        N = N + 1
        # teacher forcing: input = [eos, y_0..y_{n-1}], predict [y, eos]
        dec_in = jnp.concatenate([jnp.full((B, 1), eos, targets.dtype), targets[:, :-1]], 1)
        logits, memory, lens = self._forward(params, hs, h_lens, dec_in, rng, train)
        valid = length_mask(target_lens, N, jnp.float32)
        ce = optax.softmax_cross_entropy(
            logits,
            optax.smooth_labels(
                jax.nn.one_hot(targets, logits.shape[-1]), self.label_smoothing
            ),
        )
        loss = (ce * valid).sum() / jnp.maximum(valid.sum(), 1.0)
        pred = jnp.argmax(logits, -1)
        return loss, {"loss": loss, "prediction": pred, "prediction_len": target_lens}

    def greedy_decode(self, params, hs, h_lens) -> np.ndarray:
        """Greedy decode with static shapes: the full (padded) token buffer
        passes through the causal decoder each step — one compile total."""
        memory, lens = self.module.apply({"params": params["encoder"]}, hs, h_lens)
        B = memory.shape[0]
        eos = self.tokenizer.eos_idx
        pad = self.tokenizer.pad_idx
        L = self.max_decode_len

        @jax.jit
        def decode(dec_params, memory, lens):
            def body(carry, t):
                tokens, done = carry
                logits = self.decoder.apply({"params": dec_params}, tokens, memory, lens)
                nxt = jnp.argmax(logits[:, t], -1).astype(jnp.int32)
                nxt = jnp.where(done, pad, nxt)
                tokens = tokens.at[:, t + 1].set(nxt)
                done = done | (nxt == eos)
                return (tokens, done), None

            tokens0 = jnp.full((B, L + 1), pad, jnp.int32).at[:, 0].set(eos)
            (tokens, _), _ = jax.lax.scan(
                body, (tokens0, jnp.zeros((B,), bool)), jnp.arange(L)
            )
            return tokens

        return np.asarray(decode(params["decoder"], memory, lens))[:, 1:]

    def reduction(self, mode: str, records: List[Dict[str, Any]]) -> Dict[str, float]:
        hyps, refs, losses = [], [], []
        for r in records:
            losses.append(float(r["loss"]))
            preds = np.asarray(r["prediction"])
            lens = np.asarray(r["prediction_len"])
            for b in range(len(preds)):
                hyps.append(self.tokenizer.decode(preds[b, : int(lens[b])].tolist()))
            refs.extend(r["labels"])
        return {"loss": float(np.mean(losses)), "bleu": corpus_bleu(hyps, refs)}
