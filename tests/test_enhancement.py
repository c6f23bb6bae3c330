"""SE/SS task tests: masking head trains, reconstruction improves SI-SDR."""

import numpy as np

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from s3prl_tpu.task.enhancement import SeparationTask, si_sdr


class MaskHead(nn.Module):
    num_sources: int = 2
    n_freq: int = 257

    @nn.compact
    def __call__(self, hs, h_lens, train=False):
        x = hs[0] if hs.ndim == 4 else hs
        x = nn.Dense(128)(x)
        x = nn.relu(x)
        return nn.Dense(self.num_sources * self.n_freq)(x), h_lens


def test_si_sdr_sane():
    rng = np.random.RandomState(0)
    ref = rng.randn(8000).astype(np.float32)
    assert si_sdr(ref, ref) > 50
    assert si_sdr(rng.randn(8000).astype(np.float32), ref) < 5


def test_separation_task_trains_and_reconstructs():
    rng = np.random.RandomState(0)
    B, T = 2, 8000
    s1 = rng.randn(B, T).astype(np.float32) * 0.3
    s2 = np.sin(2 * np.pi * 440 * np.arange(T) / 16000)[None].repeat(B, 0).astype(np.float32) * 0.3
    mix = s1 + s2

    # features: the mixture's own log magnitude (simple but realistic)
    from s3prl_tpu.ops.audio import stft_complex

    feats = jnp.log(jnp.abs(stft_complex(jnp.asarray(mix))) + 1e-8)
    lens = jnp.full((B,), feats.shape[1], jnp.int32)
    batch = {
        "x": jnp.asarray(mix),
        "sources": jnp.asarray(np.stack([s1, s2], 1)),
    }

    task = SeparationTask(MaskHead(), num_sources=2)
    params = task.module.init(jax.random.key(0), feats, lens)["params"]
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        (loss, cache), grads = jax.value_and_grad(
            lambda p: task.loss_and_cache(p, feats, lens, batch, jax.random.key(0), True)
        , has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss, cache

    losses = []
    for _ in range(30):
        params, opt_state, loss, cache = step(params, opt_state)
        losses.append(float(loss))
    assert losses[-1] < losses[0]

    wavs = task.reconstruct(cache["masks"], batch["x"], T)
    assert wavs.shape == (B, 2, T)
    assert np.isfinite(np.asarray(wavs)).all()


def test_speech_translation_task():
    """ST: teacher-forced CE decreases; greedy decode + BLEU run."""
    import flax.linen as nn
    from s3prl_tpu.data.encoder import WordTokenizer
    from s3prl_tpu.models.decoder import DecoderConfig, TransformerDecoder
    from s3prl_tpu.task.speech_translation import SpeechTranslationTask

    tok = WordTokenizer.from_text(["guten tag welt", "hallo welt"])

    class Encoder(nn.Module):
        @nn.compact
        def __call__(self, hs, h_lens, train=False):
            x = hs[0] if hs.ndim == 4 else hs
            return nn.Dense(32)(x), h_lens

    dec = TransformerDecoder(DecoderConfig(vocab_size=tok.vocab_size, hidden_size=32,
                                           num_layers=1, num_heads=2, ffn_size=64))
    task = SpeechTranslationTask(Encoder(), dec, tok, max_decode_len=8)

    rng = np.random.RandomState(0)
    hs = jnp.asarray(rng.randn(1, 2, 20, 16).astype(np.float32))
    lens = jnp.asarray([20, 15])
    ids = [tok.encode("hallo welt") + [tok.eos_idx], tok.encode("guten tag welt") + [tok.eos_idx]]
    N = max(len(i) for i in ids)
    targets = np.zeros((2, N), np.int32)
    tlens = np.zeros(2, np.int32)
    for i, t in enumerate(ids):
        targets[i, :len(t)] = t
        tlens[i] = len(t)
    batch = {"class_ids": jnp.asarray(targets), "class_ids_len": jnp.asarray(tlens)}

    params = task.init_params(jax.random.key(0), hs, lens, batch)
    opt = optax.adam(5e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        (loss, cache), grads = jax.value_and_grad(
            lambda p: task.loss_and_cache(p, hs, lens, batch, jax.random.key(0), True),
            has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss, cache

    losses = []
    for _ in range(25):
        params, opt_state, loss, cache = step(params, opt_state)
        losses.append(float(loss))
    assert losses[-1] < losses[0]

    decoded = task.greedy_decode(params, hs, lens)
    assert decoded.shape[0] == 2
    logs = task.reduction("valid", [{**{k: np.asarray(v) for k, v in cache.items()},
                                     "labels": ["hallo welt", "guten tag welt"]}])
    assert "bleu" in logs and np.isfinite(logs["loss"])


def test_voice_conversion_task():
    """VC: teacher-forced L1 decreases; MCD computes."""
    import flax.linen as nn
    from s3prl_tpu.models.taco2ar import Taco2ARConfig, Taco2ARDecoder
    from s3prl_tpu.task.voice_conversion import VoiceConversionTask

    cfg = Taco2ARConfig(mel_dim=20, prenet_units=16, lstm_units=24, num_lstm_layers=1,
                        postnet_channels=16, postnet_layers=2)

    class Model(nn.Module):
        @nn.compact
        def __call__(self, hs, h_lens, prev_mels, train=False):
            feats = hs[0] if hs.ndim == 4 else hs
            pred = Taco2ARDecoder(cfg, name="decoder")(feats, prev_mels, train=train)
            return pred, h_lens

    task = VoiceConversionTask(Model(), mel_dim=20)
    rng = np.random.RandomState(0)
    hs = jnp.asarray(rng.randn(1, 2, 30, 16).astype(np.float32))
    lens = jnp.asarray([30, 22])
    batch = {
        "target_mel": jnp.asarray(rng.randn(2, 30, 20).astype(np.float32)),
        "target_mel_len": jnp.asarray([30, 22]),
    }
    params = task.init_params(jax.random.key(0), hs, lens, batch)
    opt = optax.adam(1e-2)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, key):
        (loss, cache), grads = jax.value_and_grad(
            lambda p: task.loss_and_cache(p, hs, lens, batch, key, True), has_aux=True
        )(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss, cache

    losses = []
    for i in range(15):
        params, opt_state, loss, cache = step(params, opt_state, jax.random.key(i))
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    logs = task.reduction("valid", [{k: np.asarray(v) for k, v in cache.items()}])
    assert "mcd" in logs and np.isfinite(logs["mcd"])


def test_griffin_lim_roundtrip():
    """Griffin-Lim recovers a tonal signal's spectral content: re-analyzing
    the synthesized wav matches the target log-mel closely."""
    import jax.numpy as jnp

    from s3prl_tpu.ops import audio as audio_ops
    from s3prl_tpu.ops.vocoder import log_mel_to_wav

    t = np.arange(16000) / 16000.0
    wav = (0.5 * np.sin(2 * np.pi * 440 * t) + 0.2 * np.sin(2 * np.pi * 880 * t)).astype(np.float32)
    mel, _ = audio_ops.log_mel(jnp.asarray(wav[None]), n_mels=80)
    syn = log_mel_to_wav(mel, n_iter=16)
    mel2, _ = audio_ops.log_mel(syn[:, :16000], n_mels=80)
    # compare the informative (high-energy) region of the log-mels
    m1, m2 = np.asarray(mel)[0], np.asarray(mel2)[0]
    T = min(len(m1), len(m2)) - 4
    mask = m1[:T] > m1.max() - 8.0
    err = np.abs(m1[:T] - m2[:T])[mask].mean()
    assert err < 1.0, err
