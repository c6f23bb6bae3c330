"""ESPnet torchaudio-HuBERT loader parity.

The espnet_hubert family stores torchaudio Wav2Vec2Model weights inside an
espnet2 .pth (reference: s3prl/upstream/espnet_hubert/expert.py:26-43). The
test builds the reference in-house HubertModel, renames its fairseq-style
state dict into the torchaudio/espnet key layout, and checks that
`hub.load("espnet_hubert", ckpt=...)` reproduces the reference layer OUTPUTS
(torchaudio extract_features returns one entry per transformer layer, no
input-embedding entry).
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
sys.path.insert(0, "/root/reference")

import jax.numpy as jnp

from tests.test_torch_parity import _build_ref_hubert, _ref_hidden_states


def _fairseq_to_torchaudio(sd, extractor_mode):
    """Inverse of convert.torchaudio_to_fairseq_keys, for building fixtures."""
    out = {}
    for k, v in sd.items():
        nk = None
        if k.startswith("feature_extractor.conv_layers."):
            parts = k.split(".")
            i, rest = parts[2], ".".join(parts[3:])
            if rest.startswith("0."):
                nk = f"feature_extractor.conv_layers.{i}.conv.{rest[2:]}"
            elif extractor_mode == "layer_norm" and rest.startswith("2.1."):
                nk = f"feature_extractor.conv_layers.{i}.layer_norm.{rest[4:]}"
            elif extractor_mode == "default" and rest.startswith("2."):
                nk = f"feature_extractor.conv_layers.{i}.layer_norm.{rest[2:]}"
        elif k.startswith("layer_norm."):
            nk = "encoder.feature_projection.layer_norm." + k.split(".", 1)[1]
        elif k.startswith("post_extract_proj."):
            nk = "encoder.feature_projection.projection." + k.split(".", 1)[1]
        elif k.startswith("encoder.pos_conv.0."):
            nk = "encoder.transformer.pos_conv_embed.conv." + k[len("encoder.pos_conv.0."):]
        elif k.startswith("encoder.layer_norm."):
            nk = "encoder.transformer.layer_norm." + k.split(".")[-1]
        elif k.startswith("encoder.layers."):
            parts = k.split(".")
            i, mid, leaf = parts[2], ".".join(parts[3:-1]), parts[-1]
            mid = {
                "self_attn.k_proj": "attention.k_proj",
                "self_attn.v_proj": "attention.v_proj",
                "self_attn.q_proj": "attention.q_proj",
                "self_attn.out_proj": "attention.out_proj",
                "self_attn_layer_norm": "layer_norm",
                "fc1": "feed_forward.intermediate_dense",
                "fc2": "feed_forward.output_dense",
                "final_layer_norm": "final_layer_norm",
            }.get(mid)
            if mid is not None:
                nk = f"encoder.transformer.layers.{i}.{mid}.{leaf}"
        elif k == "mask_emb":
            # lives OUTSIDE wav2vec2 in HuBERTPretrainModel
            out["__mask__"] = v
            continue
        if nk is not None:
            out[nk] = v
    return out


def test_espnet_hubert_parity(tmp_path):
    model, task_cfg = _build_ref_hubert("default", False, seed=5)
    ta_sd = _fairseq_to_torchaudio(model.state_dict(), "default")
    mask = ta_sd.pop("__mask__", None)
    prefixed = {
        f"encoder.hubert_pretrain_model.wav2vec2.{k}": v for k, v in ta_sd.items()
    }
    if mask is not None:
        prefixed["encoder.hubert_pretrain_model.mask_generator.mask_embedding"] = mask
    path = tmp_path / "espnet_hubert.pth"
    torch.save(prefixed, path)
    conf = tmp_path / "config.yaml"
    conf.write_text("encoder_conf:\n  encoder_num_heads: 4\n")

    rng = np.random.RandomState(5)
    wav_a = rng.randn(16000).astype(np.float32)
    wav_b = rng.randn(10240).astype(np.float32)
    ref_hs = _ref_hidden_states(
        model, task_cfg, [torch.from_numpy(wav_a), torch.from_numpy(wav_b)]
    )
    ref_outputs = ref_hs[1:]  # layer outputs only (espnet expert layout)

    from s3prl_tpu import hub

    up = hub.load("espnet_hubert", ckpt=str(path), model_config=str(conf))
    assert up.num_layers == 3

    wavs = np.zeros((2, 16000), np.float32)
    wavs[0], wavs[1, :10240] = wav_a, wav_b
    hs, feat_lens = up.apply_fn(
        up.params, jnp.asarray(wavs), jnp.asarray([16000, 10240])
    )
    hs, feat_lens = np.asarray(hs), np.asarray(feat_lens)
    assert hs.shape[0] == len(ref_outputs) == 3
    for l, ref in enumerate(ref_outputs):
        T = min(ref.shape[1], hs.shape[2])
        for b, valid in enumerate(feat_lens):
            n = min(int(valid), T)
            np.testing.assert_allclose(hs[l, b, :n], ref[b, :n], atol=5e-4)


def test_espnet_hubert_random_init():
    from s3prl_tpu import hub

    up = hub.load("cvhubert")  # base-shape random init
    assert up.num_layers == 12 and up.hidden_size == 768
