"""MR-HuBERT parity vs the reference hourglass model (random init)."""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
sys.path.insert(0, "/root/reference")

# omegaconf is stubbed centrally in conftest.py when absent

import jax
import jax.numpy as jnp

from s3prl_tpu.models.multires_hubert import MultiresHubertConfig, MultiresHubertModel
from s3prl_tpu.upstream.convert import multires_hubert_params_from_torch

TINY_CONV = "[(64, 10, 5), (64, 3, 2), (64, 2, 2)]"
TINY_CONV_TUPLE = ((64, 10, 5), (64, 3, 2), (64, 2, 2))


def _build_ref(use_plain: bool, seed: int = 0):
    from s3prl.upstream.multires_hubert.hubert_model import (
        MultiresHubertConfig as RefCfg,
        MultiresHubertModel as RefModel,
        MultiresHubertPretrainingConfig as RefTaskCfg,
    )

    torch.manual_seed(seed)
    cfg = RefCfg(
        label_rate=50,
        label_rate_ratios=[1, 2],
        encoder_layers=2,
        encoder_embed_dim=64,
        encoder_ffn_embed_dim=128,
        encoder_attention_heads=4,
        conv_feature_layers=TINY_CONV,
        conv_pos=16,
        conv_pos_groups=4,
        conv_adapator_kernal=7,
        use_plain_updownsample=use_plain,
        dropout=0.0,
        attention_dropout=0.0,
        activation_dropout=0.0,
        dropout_input=0.0,
        dropout_features=0.0,
        encoder_layerdrop=0.0,
    )
    task_cfg = RefTaskCfg(label_rate=50, label_rate_ratios=[1, 2], normalize=False)
    model = RefModel(cfg, task_cfg, [list(range(8)), list(range(8))])
    model.eval()
    return model


def _ref_hidden_states(model, wavs_list):
    """Reproduce the expert's hook capture + upsample postprocess
    (multires_hubert/expert.py:48-101)."""
    captured = []
    factors = []

    feature_ds_rates = model.feature_ds_rates
    lcm = np.lcm.reduce(feature_ds_rates)
    upsample_factor = [lcm // res for res in feature_ds_rates][::-1]
    reverse_upsample_factor = upsample_factor[::-1][1:]

    hooks = []

    def add(module, transform, factor):
        hooks.append((module, transform, factor))

    for i, enc in enumerate(model.encoders):
        for layer in enc.layers:
            add(layer, "pre", upsample_factor[i])
        add(enc, "out", upsample_factor[i])
    for layer in model.middle_encoder.layers:
        add(layer, "pre", upsample_factor[len(model.encoders)])
    add(model.middle_encoder, "out", upsample_factor[len(model.encoders)])
    for i, dec in enumerate(model.decoders):
        for layer in dec.layers:
            add(layer, "pre", reverse_upsample_factor[i])
        add(dec, "out", reverse_upsample_factor[i])

    handles = []
    for module, transform, factor in hooks:
        if transform == "pre":
            handles.append(
                module.register_forward_pre_hook(
                    lambda mod, inp, f=factor: captured.append(
                        (inp[0].transpose(0, 1).detach(), f)
                    )
                )
            )
        else:
            handles.append(
                module.register_forward_hook(
                    lambda mod, inp, out, f=factor: captured.append(
                        (out[0].detach(), f)
                    )
                )
            )

    lens = torch.LongTensor([len(w) for w in wavs_list])
    padded = torch.nn.utils.rnn.pad_sequence(wavs_list, batch_first=True)
    pad_mask = ~(torch.arange(padded.size(1))[None] < lens[:, None])
    with torch.no_grad():
        model.extract_features(padded, padding_mask=pad_mask, mask=None)
    for h in handles:
        h.remove()

    ups = [h.repeat_interleave(f, dim=1) for h, f in captured]
    unpad = min(h.size(1) for h in ups)
    return [h[:, :unpad].numpy() for h in ups]


@pytest.mark.parametrize("use_plain", [False, True], ids=["adapter", "plain"])
def test_multires_hubert_parity(use_plain):
    ref = _build_ref(use_plain)

    rng = np.random.RandomState(0)
    wav_a = rng.randn(16000).astype(np.float32)
    wav_b = rng.randn(10240).astype(np.float32)
    ref_hs = _ref_hidden_states(ref, [torch.from_numpy(wav_a), torch.from_numpy(wav_b)])

    cfg = MultiresHubertConfig(
        conv_feature_layers=TINY_CONV_TUPLE,
        encoder_embed_dim=64,
        encoder_ffn_embed_dim=128,
        encoder_attention_heads=4,
        conv_pos=16,
        conv_pos_groups=4,
        label_rate_ratios=(1, 2),
        encoder_layers=2,
        conv_adapator_kernal=7,
        use_plain_updownsample=use_plain,
        dropout=0.0,
        attention_dropout=0.0,
        activation_dropout=0.0,
        dropout_input=0.0,
    )
    params = multires_hubert_params_from_torch(ref.state_dict(), cfg)
    ours = MultiresHubertModel(cfg)

    B = 2
    wavs = np.zeros((B, 16000), np.float32)
    wavs[0] = wav_a
    wavs[1, :10240] = wav_b
    hs, out_lens = ours.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)},
        jnp.asarray(wavs), jnp.asarray([16000, 10240]), deterministic=True,
    )
    hs = np.asarray(hs)
    assert hs.shape[0] == len(ref_hs) == cfg.num_hidden_states

    n_valid = int(np.asarray(out_lens).min())
    T = min(hs.shape[2], ref_hs[0].shape[1], n_valid)
    for l, ref_layer in enumerate(ref_hs):
        np.testing.assert_allclose(
            hs[l, :, :T], ref_layer[:, :T], atol=5e-4, err_msg=f"state {l}"
        )
