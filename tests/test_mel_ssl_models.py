"""Mel-domain SSL family: mockingjay / tera / audio_albert / apc / vq_apc /
npc upstreams + their pretraining objectives (MAM, autoregressive)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from s3prl_tpu import hub
from s3prl_tpu.util.pseudo_data import pseudo_batch


@pytest.mark.parametrize(
    "name,num_layers,hidden",
    [
        ("mockingjay", 4, 768),
        ("tera", 4, 768),
        ("audio_albert", 4, 768),
        ("apc", 3, 512),
        ("vq_apc", 3, 512),
        ("npc", 9, 512),
    ],
)
def test_mel_ssl_upstream_forward(name, num_layers, hidden):
    up = hub.load(name)
    wavs, lens = pseudo_batch([1.0, 0.62])
    hs, h_lens = up(jnp.asarray(wavs), jnp.asarray(lens))
    assert hs.shape[0] == num_layers
    assert hs.shape[-1] == hidden
    np.testing.assert_array_equal(np.asarray(h_lens), (lens - 1) // 160 + 1)
    assert np.isfinite(np.asarray(hs)).all()


def test_audio_albert_shares_weights():
    """ALBERT variant must have a single (unstacked) layer param set."""
    up_albert = hub.load("audio_albert")
    up_tera = hub.load("tera")
    q_albert = up_albert.params["params"]["layers"]["query"]["kernel"]
    q_tera = up_tera.params["params"]["layers"]["query"]["kernel"]
    assert q_albert.ndim == 2  # shared: [C, C]
    assert q_tera.ndim == 3  # stacked: [L, C, C]


def test_masked_reconstruction_task_trains():
    from s3prl_tpu.models.mockingjay import (
        MockingjayConfig,
        MockingjayEncoder,
        SpecPredictionHead,
    )
    from s3prl_tpu.task.reconstruction import MaskedReconstructionTask
    import flax.linen as nn
    import optax

    cfg = MockingjayConfig(
        input_dim=80, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=128,
    )

    class PretrainModel(nn.Module):
        @nn.compact
        def __call__(self, feats, feat_lens, train=False):
            hs, lens = MockingjayEncoder(cfg, name="encoder")(
                feats, feat_lens, deterministic=not train
            )
            pred = SpecPredictionHead(cfg, output_dim=80, name="head")(hs[-1])
            return pred, lens

    task = MaskedReconstructionTask(PretrainModel(), mask_frequency=0.1)
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(2, 50, 80).astype(np.float32))
    lens = jnp.asarray([50, 30])
    params = task.init_params(jax.random.key(0), feats, lens, {})
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, key):
        (loss, cache), grads = jax.value_and_grad(task.loss_and_cache, has_aux=True)(
            params, feats, lens, {}, key, True
        )
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for i in range(8):
        params, opt_state, loss = step(params, opt_state, jax.random.key(i))
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]  # learning happens


def test_autoregressive_task_with_apc():
    from s3prl_tpu.models.apc import APCConfig, APCModel
    from s3prl_tpu.task.reconstruction import AutoregressiveReconstructionTask
    import flax.linen as nn

    cfg = APCConfig(input_size=40, hidden_size=32, num_layers=2)

    class Wrapper(nn.Module):
        @nn.compact
        def __call__(self, feats, feat_lens, train=False):
            hs, pred, lens = APCModel(cfg, name="apc")(feats, feat_lens, train=train)
            return pred, lens

    task = AutoregressiveReconstructionTask(Wrapper(), n_future=3)
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(2, 40, 40).astype(np.float32))
    lens = jnp.asarray([40, 25])
    params = task.init_params(jax.random.key(0), feats, lens, {})
    loss, cache = task.loss_and_cache(params, feats, lens, {}, jax.random.key(1), False)
    assert np.isfinite(float(loss))


def test_distilhubert_upstream():
    up = hub.load("distilhubert")
    wavs, lens = pseudo_batch([0.6, 0.4])
    hs, h_lens = up(jnp.asarray(wavs), jnp.asarray(lens))
    assert hs.shape[0] == 15  # feat_final + 2 layers + 12 prediction heads
    assert hs.shape[-1] == 768
    np.testing.assert_array_equal(np.asarray(h_lens), (lens - 1) // 320 + 1)


def test_data2vec_upstream():
    up = hub.load("data2vec")
    wavs, lens = pseudo_batch([0.6, 0.4])
    hs, h_lens = up(jnp.asarray(wavs), jnp.asarray(lens))
    assert hs.shape[0] == 13
    assert np.isfinite(np.asarray(hs)).all()


def test_wav2vec1_upstream():
    up = hub.load("wav2vec")
    wavs, lens = pseudo_batch([0.6, 0.4])
    hs, h_lens = up(jnp.asarray(wavs), jnp.asarray(lens))
    assert hs.shape[0] == 13  # z + 11 agg inputs + agg output
    assert hs.shape[-1] == 512
    np.testing.assert_array_equal(np.asarray(h_lens), (lens - 1) // 160 + 1)


def test_decoar2_upstream():
    up = hub.load("decoar2")
    wavs, lens = pseudo_batch([0.6, 0.4])
    hs, h_lens = up(jnp.asarray(wavs), jnp.asarray(lens))
    assert hs.shape[0] == 13 and hs.shape[-1] == 768


@pytest.mark.parametrize("name", ["log_stft", "spec_augment", "example", "vggish", "byol_a"])
def test_small_upstreams(name):
    up = hub.load(name)
    wavs, lens = pseudo_batch([1.2, 0.9])
    hs, h_lens = up(jnp.asarray(wavs), jnp.asarray(lens))
    assert hs.shape[0] == 1
    assert np.isfinite(np.asarray(hs)).all()
    np.testing.assert_array_equal(
        np.asarray(h_lens), (lens - 1) // up.downsample_rate + 1
    )


@pytest.mark.parametrize("name,stride", [("ssast_patch_base", 1600), ("ssast_frame_base", 320)])
def test_ast_upstreams(name, stride):
    up = hub.load(name)
    assert up.downsample_rate == stride
    wavs, lens = pseudo_batch([1.5, 1.0])
    hs, h_lens = up(jnp.asarray(wavs), jnp.asarray(lens))
    assert hs.shape[0] == 13 and hs.shape[-1] == 768
    assert np.isfinite(np.asarray(hs)).all()


def test_cpc_upstream():
    up = hub.load("cpc")
    wavs, lens = pseudo_batch([0.6, 0.4])
    hs, h_lens = up(jnp.asarray(wavs), jnp.asarray(lens))
    assert hs.shape[0] == 2 and hs.shape[-1] == 256
    assert np.isfinite(np.asarray(hs)).all()


def test_multires_hubert_upstream():
    up = hub.load("multires_hubert")
    wavs, lens = pseudo_batch([0.6, 0.4])
    hs, h_lens = up(jnp.asarray(wavs), jnp.asarray(lens))
    # default config: 3 U-net blocks x (2 layers + 1 output) each
    assert hs.shape[0] == 9
    assert np.isfinite(np.asarray(hs)).all()


@pytest.mark.slow
def test_hf_wav2vec2_upstream():
    up = hub.load("hf_wav2vec2")
    wavs, lens = pseudo_batch([0.6, 0.4])
    hs, h_lens = up(jnp.asarray(wavs), jnp.asarray(lens))
    assert hs.shape[0] == up.num_layers
    assert np.isfinite(np.asarray(hs)).all()


def test_conformer_upstream():
    # published conformer shapes are Large (24L/1024, LL_relpos ckpts)
    up = hub.load("wav2vec2_conformer")
    wavs, lens = pseudo_batch([0.5, 0.4])
    hs, h_lens = up(jnp.asarray(wavs), jnp.asarray(lens))
    assert hs.shape[0] == 25 and hs.shape[-1] == 1024
    assert np.isfinite(np.asarray(hs)).all()


def test_ast_converter_roundtrip():
    """A synthetic timm-format state_dict must land exactly on the ASTEncoder
    param tree (structure + shapes + values)."""
    import jax
    from s3prl_tpu.models.ast import ASTConfig, ASTEncoder
    from s3prl_tpu.upstream.convert import ast_params_from_torch

    cfg = ASTConfig(embed_dim=32, depth=2, num_heads=4, input_tdim=40, input_fdim=32,
                    fshape=16, tshape=16, fstride=16, tstride=16)
    model = ASTEncoder(cfg)
    fb = jnp.zeros((1, cfg.input_tdim, cfg.input_fdim), jnp.float32)
    target = jax.jit(lambda k: model.init(k, fb, deterministic=True))(jax.random.key(0))["params"]

    rng = np.random.RandomState(0)
    n_patches = cfg.f_patches * cfg.t_patches

    def t(*shape):
        import torch
        return torch.from_numpy(rng.randn(*shape).astype(np.float32))

    import torch
    sd = {
        "patch_embed.proj.weight": t(32, 1, cfg.tshape, cfg.fshape),
        "patch_embed.proj.bias": t(32),
        "cls_token": t(1, 1, 32),
        "pos_embed": t(1, n_patches + 1, 32),
        "norm.weight": t(32), "norm.bias": t(32),
    }
    for i in range(2):
        p = f"blocks.{i}"
        sd |= {
            f"{p}.norm1.weight": t(32), f"{p}.norm1.bias": t(32),
            f"{p}.attn.qkv.weight": t(96, 32), f"{p}.attn.qkv.bias": t(96),
            f"{p}.attn.proj.weight": t(32, 32), f"{p}.attn.proj.bias": t(32),
            f"{p}.norm2.weight": t(32), f"{p}.norm2.bias": t(32),
            f"{p}.mlp.fc1.weight": t(128, 32), f"{p}.mlp.fc1.bias": t(128),
            f"{p}.mlp.fc2.weight": t(32, 128), f"{p}.mlp.fc2.bias": t(32),
        }
    converted = ast_params_from_torch(sd, depth=2)
    # structure + shapes match the init tree exactly
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_equal(np.asarray(a).shape, np.asarray(b).shape),
        target, converted,
    )
    # and the model runs with converted weights
    hs = model.apply({"params": jax.tree_util.tree_map(jnp.asarray, converted)}, fb, deterministic=True)
    assert np.isfinite(np.asarray(hs)).all()
