"""PyTorch checkpoint -> JAX parameter conversion for the wav2vec2/HuBERT trunk.

The analog of the reference's fairseq-ckpt conversion layer
(s3prl/upstream/utils.py:14-51 + per-model convert.py): s3prl publishes
self-contained checkpoints `{"task_cfg", "model_cfg", "model_weight"}`
(huggingface.co/s3prl/converted_ckpts); this module maps those torch
state_dicts onto the flax param tree of
:class:`s3prl_tpu.models.wav2vec2.Wav2Vec2Trunk`.

Layout notes:
- torch Conv1d weights [out, in/groups, k] -> flax [k, in/groups, out];
- torch Linear [out, in] -> flax kernel [in, out];
- the pos-conv's torch weight_norm (dim=2) is folded into a plain kernel
  (W = g * v / ||v||_{dims 0,1}) — weight norm is a pure reparametrization;
- per-layer transformer weights are stacked along a leading L axis to match
  the `nn.scan`-stacked encoder;
- q/k/v projections are concatenated into the fused qkv kernel.
"""

from __future__ import annotations

import logging
from typing import Any, Dict, Tuple

import numpy as np

from ..models.wav2vec2 import Wav2Vec2Config

logger = logging.getLogger(__name__)


def _t(x) -> np.ndarray:  # torch tensor -> numpy
    return np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach") else x)


def _linear(sd: Dict[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    out = {"kernel": _t(sd[f"{prefix}.weight"]).T}
    if f"{prefix}.bias" in sd:
        out["bias"] = _t(sd[f"{prefix}.bias"])
    return out


def _norm(sd: Dict[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    return {"scale": _t(sd[f"{prefix}.weight"]), "bias": _t(sd[f"{prefix}.bias"])}


def _fold_weight_norm(g: np.ndarray, v: np.ndarray) -> np.ndarray:
    """torch weight_norm(dim=2) on conv [out, in, k]: W = g * v / ||v||_{0,1}."""
    norm = np.sqrt((v ** 2).sum(axis=(0, 1), keepdims=True))
    return g * v / np.maximum(norm, 1e-12)


def config_from_model_cfg(model_cfg: Dict[str, Any], task_cfg: Dict[str, Any] = None) -> Wav2Vec2Config:
    """Build our trunk config from an s3prl/fairseq model_cfg dict."""
    conv = model_cfg.get("conv_feature_layers", None)
    if isinstance(conv, str):
        import ast

        conv = tuple(tuple(c) for c in ast.literal_eval(conv))
    elif conv is not None:
        conv = tuple(tuple(c) for c in conv)
    kwargs = dict(
        extractor_mode=model_cfg.get("extractor_mode", "default"),
        encoder_layers=model_cfg.get("encoder_layers", 12),
        encoder_embed_dim=model_cfg.get("encoder_embed_dim", 768),
        encoder_ffn_embed_dim=model_cfg.get("encoder_ffn_embed_dim", 3072),
        encoder_attention_heads=model_cfg.get("encoder_attention_heads", 12),
        activation_fn=model_cfg.get("activation_fn", "gelu"),
        layer_norm_first=model_cfg.get("layer_norm_first", False),
        conv_bias=model_cfg.get("conv_bias", False),
        conv_pos=model_cfg.get("conv_pos", 128),
        conv_pos_groups=model_cfg.get("conv_pos_groups", 16),
        dropout=model_cfg.get("dropout", 0.1),
        attention_dropout=model_cfg.get("attention_dropout", 0.1),
        activation_dropout=model_cfg.get("activation_dropout", 0.0),
        dropout_input=model_cfg.get("dropout_input", 0.1),
        encoder_layerdrop=model_cfg.get("encoder_layerdrop", 0.0),
        layer_type=model_cfg.get("layer_type", "transformer"),
        # wav2vec2-class models use conv-arithmetic feature lengths; hubert
        # the block-folded rule (see registry note)
        feat_pad_rule="conv"
        if model_cfg.get("_name", "") in ("wav2vec2", "data2vec_audio")
        or model_cfg.get("layer_type") == "conformer"
        else "block",
        pos_enc_type=model_cfg.get("pos_enc_type", "rel_pos"),
        depthwise_conv_kernel_size=model_cfg.get("depthwise_conv_kernel_size", 31),
        normalize=(task_cfg or {}).get("normalize", False),
    )
    if conv is not None:
        kwargs["conv_feature_layers"] = conv
    return Wav2Vec2Config(**kwargs)


def trunk_params_from_torch(sd: Dict[str, Any], cfg: Wav2Vec2Config) -> Dict[str, Any]:
    """Map a wav2vec2/HuBERT torch state_dict to the Wav2Vec2Trunk param tree."""
    params: Dict[str, Any] = {}

    # --- conv feature extractor ---
    fe: Dict[str, Any] = {}
    for i, (dim, k, s) in enumerate(cfg.conv_feature_layers):
        conv = {
            "kernel": _t(sd[f"feature_extractor.conv_layers.{i}.0.weight"]).transpose(2, 1, 0)
        }
        if cfg.conv_bias:
            conv["bias"] = _t(sd[f"feature_extractor.conv_layers.{i}.0.bias"])
        fe[f"conv_{i}"] = conv
        if cfg.extractor_mode == "layer_norm":
            fe[f"ln_{i}"] = _norm(sd, f"feature_extractor.conv_layers.{i}.2.1")
        elif cfg.extractor_mode == "default" and i == 0:
            fe["gn_0"] = _norm(sd, "feature_extractor.conv_layers.0.2")
    params["feature_extractor"] = fe

    params["layer_norm"] = _norm(sd, "layer_norm")
    if "post_extract_proj.weight" in sd:
        params["post_extract_proj"] = _linear(sd, "post_extract_proj")
    if "mask_emb" in sd:
        params["mask_emb"] = _t(sd["mask_emb"])
    else:
        params["mask_emb"] = np.zeros((cfg.encoder_embed_dim,), np.float32)

    # --- encoder ---
    enc: Dict[str, Any] = {}
    if "encoder.pos_conv.0.0.weight" in sd:
        # data2vec-style depth-N pos-conv stack (blocks of conv+LN(no affine))
        pos: Dict[str, Any] = {}
        i = 0
        while f"encoder.pos_conv.{i}.0.weight" in sd:
            pos[f"conv_{i}"] = {
                "kernel": _t(sd[f"encoder.pos_conv.{i}.0.weight"]).transpose(2, 1, 0),
                "bias": _t(sd[f"encoder.pos_conv.{i}.0.bias"]),
            }
            i += 1
        enc["pos_conv"] = pos
    elif "encoder.pos_conv.0.weight_g" in sd:
        w = _fold_weight_norm(
            _t(sd["encoder.pos_conv.0.weight_g"]), _t(sd["encoder.pos_conv.0.weight_v"])
        )
        enc["pos_conv"] = {
            "conv": {"kernel": w.transpose(2, 1, 0), "bias": _t(sd["encoder.pos_conv.0.bias"])}
        }
    else:
        w = _t(sd["encoder.pos_conv.0.weight"])
        enc["pos_conv"] = {
            "conv": {"kernel": w.transpose(2, 1, 0), "bias": _t(sd["encoder.pos_conv.0.bias"])}
        }
    enc["layer_norm"] = _norm(sd, "encoder.layer_norm")

    L = cfg.encoder_layers
    per_layer = []
    for i in range(L):
        p = f"encoder.layers.{i}"
        qkv_w = np.concatenate(
            [_t(sd[f"{p}.self_attn.{n}_proj.weight"]).T for n in ("q", "k", "v")], axis=1
        )
        qkv_b = np.concatenate(
            [_t(sd[f"{p}.self_attn.{n}_proj.bias"]) for n in ("q", "k", "v")], axis=0
        )
        per_layer.append(
            {
                "self_attn": {
                    "qkv": {"kernel": qkv_w, "bias": qkv_b},
                    "out_proj": _linear(sd, f"{p}.self_attn.out_proj"),
                },
                "self_attn_layer_norm": _norm(sd, f"{p}.self_attn_layer_norm"),
                "fc1": _linear(sd, f"{p}.fc1"),
                "fc2": _linear(sd, f"{p}.fc2"),
                "final_layer_norm": _norm(sd, f"{p}.final_layer_norm"),
            }
        )
    # stack across layers (leading L axis) for the nn.scan encoder
    import jax

    enc["layers"] = jax.tree_util.tree_map(lambda *xs: np.stack(xs, 0), *per_layer)
    params["encoder"] = enc
    return params


def _conformer_layer_variables(sd: Dict[str, Any], p: str, pos_enc: str):
    """One ConformerWav2Vec2EncoderLayer -> (params, batch_stats) for
    models/transformer.ConformerLayer (reference names at
    wav2vec2_model.py:441-594)."""
    attn = {
        "linear_q": _linear(sd, f"{p}.self_attn.linear_q"),
        "linear_k": _linear(sd, f"{p}.self_attn.linear_k"),
        "linear_v": _linear(sd, f"{p}.self_attn.linear_v"),
        "linear_out": _linear(sd, f"{p}.self_attn.linear_out"),
    }
    if pos_enc == "rel_pos":
        attn["linear_pos"] = _linear(sd, f"{p}.self_attn.linear_pos")
        attn["pos_bias_u"] = _t(sd[f"{p}.self_attn.pos_bias_u"])
        attn["pos_bias_v"] = _t(sd[f"{p}.self_attn.pos_bias_v"])
    params = {
        "ffn1_layer_norm": _norm(sd, f"{p}.ffn1.layer_norm"),
        "ffn1_w1": _linear(sd, f"{p}.ffn1.w_1"),
        "ffn1_w2": _linear(sd, f"{p}.ffn1.w_2"),
        "self_attn_layer_norm": _norm(sd, f"{p}.self_attn_layer_norm"),
        "self_attn": attn,
        "conv_ln": _norm(sd, f"{p}.conv_module.layer_norm"),
        # pointwise Conv1d k=1 [out, in, 1] -> Dense kernel [in, out]
        "conv_pw1": {"kernel": _t(sd[f"{p}.conv_module.pointwise_conv1.weight"])[:, :, 0].T},
        "conv_dw": {"kernel": _t(sd[f"{p}.conv_module.depthwise_conv.weight"]).transpose(2, 1, 0)},
        "conv_bn": _norm(sd, f"{p}.conv_module.batch_norm"),
        "conv_pw2": {"kernel": _t(sd[f"{p}.conv_module.pointwise_conv2.weight"])[:, :, 0].T},
        "ffn2_layer_norm": _norm(sd, f"{p}.ffn2.layer_norm"),
        "ffn2_w1": _linear(sd, f"{p}.ffn2.w_1"),
        "ffn2_w2": _linear(sd, f"{p}.ffn2.w_2"),
        "final_layer_norm": _norm(sd, f"{p}.final_layer_norm"),
    }
    stats = {
        "conv_bn": {
            "mean": _t(sd[f"{p}.conv_module.batch_norm.running_mean"]),
            "var": _t(sd[f"{p}.conv_module.batch_norm.running_var"]),
        }
    }
    return params, stats


def conformer_trunk_variables_from_torch(sd: Dict[str, Any], cfg: Wav2Vec2Config):
    """Conformer-encoder trunk -> full variables dict (params + batch_stats).

    The reference ConformerEncoder inherits but never applies pos_conv
    (extract_features override), so those weights are intentionally dropped.
    """
    import jax

    params: Dict[str, Any] = {}
    fe: Dict[str, Any] = {}
    for i, (dim, k, s) in enumerate(cfg.conv_feature_layers):
        conv = {"kernel": _t(sd[f"feature_extractor.conv_layers.{i}.0.weight"]).transpose(2, 1, 0)}
        if cfg.conv_bias:
            conv["bias"] = _t(sd[f"feature_extractor.conv_layers.{i}.0.bias"])
        fe[f"conv_{i}"] = conv
        if cfg.extractor_mode == "layer_norm":
            fe[f"ln_{i}"] = _norm(sd, f"feature_extractor.conv_layers.{i}.2.1")
        elif cfg.extractor_mode == "default" and i == 0:
            fe["gn_0"] = _norm(sd, "feature_extractor.conv_layers.0.2")
    params["feature_extractor"] = fe
    params["layer_norm"] = _norm(sd, "layer_norm")
    if "post_extract_proj.weight" in sd:
        params["post_extract_proj"] = _linear(sd, "post_extract_proj")
    params["mask_emb"] = _t(sd["mask_emb"]) if "mask_emb" in sd else np.zeros(
        (cfg.encoder_embed_dim,), np.float32
    )
    enc: Dict[str, Any] = {"layer_norm": _norm(sd, "encoder.layer_norm")}
    per_layer, per_stats = [], []
    for i in range(cfg.encoder_layers):
        p, st = _conformer_layer_variables(sd, f"encoder.layers.{i}", cfg.pos_enc_type)
        per_layer.append(p)
        per_stats.append(st)
    enc["layers"] = jax.tree_util.tree_map(lambda *xs: np.stack(xs, 0), *per_layer)
    params["encoder"] = enc
    stats = {
        "encoder": {
            "layers": jax.tree_util.tree_map(lambda *xs: np.stack(xs, 0), *per_stats)
        }
    }
    return {"params": params, "batch_stats": stats}


def load_checkpoint(path: str) -> Tuple[Wav2Vec2Config, Dict[str, Any]]:
    """Load an s3prl converted checkpoint (or raw state_dict) -> (cfg, params)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "model_weight" in ckpt:
        sd = ckpt["model_weight"]
        cfg = config_from_model_cfg(ckpt.get("model_cfg", {}), ckpt.get("task_cfg", {}))
    else:
        sd = ckpt
        cfg = Wav2Vec2Config()
    return cfg, trunk_params_from_torch(sd, cfg)


def load_params(path: str) -> Dict[str, Any]:
    return load_checkpoint(path)[1]


def load_trunk_variables(path: str, fallback_cfg: Wav2Vec2Config = None):
    """Load a trunk ckpt -> (cfg-from-ckpt, full variables dict).

    Unlike load_params, the architecture config comes from the checkpoint's
    model_cfg (so named aliases like xlsr_53 build the right shape), and
    conformer encoders return batch_stats alongside params.

    NATIVE checkpoints (this framework's own hubert/data2vec pretrain
    recipes — a Trainer step dir / train dir / params.msgpack) load the
    pretrain task's `trunk` subtree under the factory's config; shape
    mismatches fail loudly at apply.
    """
    native = _native_pretrain_msgpack(path)
    if native is not None:
        cfg = fallback_cfg or Wav2Vec2Config()
        if "trunk" in native:  # HubertForPretrain task layout
            return cfg, {"params": native["trunk"]}
        if "student" in native:  # data2vec EMA task: the student trunk ships
            return cfg, {"params": native["student"]}
        if "feature_extractor" in native:  # a bare trunk param tree
            return cfg, {"params": native}
        raise ValueError(
            f"native checkpoint {path} has top-level keys {sorted(native)} — "
            "expected a 'trunk' (hubert pretrain) / 'student' (data2vec "
            "pretrain) subtree or a bare Wav2Vec2Trunk tree"
        )

    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "model_weight" in ckpt:
        sd = ckpt["model_weight"]
        cfg = config_from_model_cfg(ckpt.get("model_cfg", {}), ckpt.get("task_cfg", {}))
    else:
        sd = ckpt
        cfg = fallback_cfg or Wav2Vec2Config()
    if cfg.layer_type == "conformer":
        return cfg, conformer_trunk_variables_from_torch(sd, cfg)
    return cfg, {"params": trunk_params_from_torch(sd, cfg)}


# ---------------------------------------------------------------------------
# WavLM (reference: s3prl/upstream/wavlm — official MSFT ckpt {"cfg","model"})
# ---------------------------------------------------------------------------


def wavlm_config_from_cfg(cfg_dict: Dict[str, Any]):
    """Map a WavLM checkpoint cfg dict onto our WavLMConfig."""
    import ast

    from ..models.wavlm import WavLMConfig

    conv = cfg_dict.get("conv_feature_layers")
    kwargs = dict(
        extractor_mode=cfg_dict.get("extractor_mode", "default"),
        encoder_layers=cfg_dict.get("encoder_layers", 12),
        encoder_embed_dim=cfg_dict.get("encoder_embed_dim", 768),
        encoder_ffn_embed_dim=cfg_dict.get("encoder_ffn_embed_dim", 3072),
        encoder_attention_heads=cfg_dict.get("encoder_attention_heads", 12),
        activation_fn=cfg_dict.get("activation_fn", "gelu"),
        layer_norm_first=cfg_dict.get("layer_norm_first", False),
        conv_bias=cfg_dict.get("conv_bias", False),
        conv_pos=cfg_dict.get("conv_pos", 128),
        conv_pos_groups=cfg_dict.get("conv_pos_groups", 16),
        dropout=cfg_dict.get("dropout", 0.1),
        attention_dropout=cfg_dict.get("attention_dropout", 0.1),
        activation_dropout=cfg_dict.get("activation_dropout", 0.0),
        dropout_input=cfg_dict.get("dropout_input", 0.0),
        normalize=cfg_dict.get("normalize", False),
        relative_position_embedding=cfg_dict.get("relative_position_embedding", True),
        num_buckets=cfg_dict.get("num_buckets", 320),
        max_distance=cfg_dict.get("max_distance", 800),
        gru_rel_pos=cfg_dict.get("gru_rel_pos", True),
    )
    if isinstance(conv, str):
        kwargs["conv_feature_layers"] = tuple(tuple(c) for c in ast.literal_eval(conv))
    elif conv is not None:
        kwargs["conv_feature_layers"] = tuple(tuple(c) for c in conv)
    return WavLMConfig(**kwargs)


def wavlm_params_from_torch(sd: Dict[str, Any], cfg) -> Dict[str, Any]:
    """Map a WavLM torch state_dict to the WavLMModel param tree."""
    import jax

    params: Dict[str, Any] = {}
    fe: Dict[str, Any] = {}
    for i, (dim, k, s) in enumerate(cfg.conv_feature_layers):
        conv = {"kernel": _t(sd[f"feature_extractor.conv_layers.{i}.0.weight"]).transpose(2, 1, 0)}
        if cfg.conv_bias:
            conv["bias"] = _t(sd[f"feature_extractor.conv_layers.{i}.0.bias"])
        fe[f"conv_{i}"] = conv
        if cfg.extractor_mode == "layer_norm":
            fe[f"ln_{i}"] = _norm(sd, f"feature_extractor.conv_layers.{i}.2.1")
        elif cfg.extractor_mode == "default" and i == 0:
            fe["gn_0"] = _norm(sd, "feature_extractor.conv_layers.0.2")
    params["feature_extractor"] = fe
    params["layer_norm"] = _norm(sd, "layer_norm")
    if "post_extract_proj.weight" in sd:
        params["post_extract_proj"] = _linear(sd, "post_extract_proj")
    params["mask_emb"] = _t(sd["mask_emb"]) if "mask_emb" in sd else np.zeros(
        (cfg.encoder_embed_dim,), np.float32
    )
    w = _fold_weight_norm(
        _t(sd["encoder.pos_conv.0.weight_g"]), _t(sd["encoder.pos_conv.0.weight_v"])
    )
    params["pos_conv"] = {
        "conv": {"kernel": w.transpose(2, 1, 0), "bias": _t(sd["encoder.pos_conv.0.bias"])}
    }
    params["enc_layer_norm"] = _norm(sd, "encoder.layer_norm")
    if cfg.relative_position_embedding:
        params["relative_attention_bias"] = _t(
            sd["encoder.layers.0.self_attn.relative_attention_bias.weight"]
        )
    per_layer = []
    for i in range(cfg.encoder_layers):
        p = f"encoder.layers.{i}"
        qkv_w = np.concatenate(
            [_t(sd[f"{p}.self_attn.{n}_proj.weight"]).T for n in ("q", "k", "v")], axis=1
        )
        qkv_b = np.concatenate(
            [_t(sd[f"{p}.self_attn.{n}_proj.bias"]) for n in ("q", "k", "v")], axis=0
        )
        layer = {
            "self_attn": {
                "qkv": {"kernel": qkv_w, "bias": qkv_b},
                "out_proj": _linear(sd, f"{p}.self_attn.out_proj"),
            },
            "self_attn_layer_norm": _norm(sd, f"{p}.self_attn_layer_norm"),
            "fc1": _linear(sd, f"{p}.fc1"),
            "fc2": _linear(sd, f"{p}.fc2"),
            "final_layer_norm": _norm(sd, f"{p}.final_layer_norm"),
        }
        if cfg.gru_rel_pos:
            layer["grep_linear"] = _linear(sd, f"{p}.self_attn.grep_linear")
            layer["grep_a"] = _t(sd[f"{p}.self_attn.grep_a"])
        per_layer.append(layer)
    params["layers"] = jax.tree_util.tree_map(lambda *xs: np.stack(xs, 0), *per_layer)
    return params


def load_wavlm_checkpoint(path: str):
    """Load an official/msft-style WavLM ckpt -> (WavLMConfig, params)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    cfg = wavlm_config_from_cfg(ckpt.get("cfg", {}))
    return cfg, wavlm_params_from_torch(ckpt["model"], cfg)


# ---------------------------------------------------------------------------
# Mockingjay / TERA / AudioALBERT (reference: upstream/mockingjay/model.py —
# torch naming follows BERT: encoder.layer.{i}.attention.self.query ...)
# ---------------------------------------------------------------------------


def mockingjay_params_from_torch(sd: Dict[str, Any], num_layers: int, share_layer: bool = False) -> Dict[str, Any]:
    """Map a TransformerModel state_dict to the MockingjayEncoder param tree.

    Accepts either bare TransformerModel keys or the `transformer.`-prefixed
    keys found inside pretraining checkpoints.
    """
    import jax

    if any(k.startswith("transformer.") for k in sd):
        sd = {k[len("transformer."):]: v for k, v in sd.items() if k.startswith("transformer.")}

    params: Dict[str, Any] = {
        "spec_transform": _linear(sd, "input_representations.spec_transform"),
        "input_layer_norm": _norm(sd, "input_representations.LayerNorm"),
    }

    def layer(i):
        p = f"encoder.layer.{i}"
        return {
            "query": _linear(sd, f"{p}.attention.self.query"),
            "key": _linear(sd, f"{p}.attention.self.key"),
            "value": _linear(sd, f"{p}.attention.self.value"),
            "attn_output": _linear(sd, f"{p}.attention.output.dense"),
            "attn_layer_norm": _norm(sd, f"{p}.attention.output.LayerNorm"),
            "intermediate": _linear(sd, f"{p}.intermediate.dense"),
            "output": _linear(sd, f"{p}.output.dense"),
            "out_layer_norm": _norm(sd, f"{p}.output.LayerNorm"),
        }

    if share_layer:
        params["layers"] = layer(0)
    else:
        per_layer = [layer(i) for i in range(num_layers)]
        params["layers"] = jax.tree_util.tree_map(lambda *xs: np.stack(xs, 0), *per_layer)
    return params


# ---------------------------------------------------------------------------
# DistilHuBERT (reference: s3prl/upstream/distiller/model.py — ckpts store
# {"config", "model"}; the trunk reuses wav2vec2 names plus output_layer)
# ---------------------------------------------------------------------------


def distiller_params_from_torch(sd: Dict[str, Any], cfg) -> Dict[str, Any]:
    """Map a DistillerModel state_dict onto models/distiller.DistillerModel."""
    import jax

    params: Dict[str, Any] = {}
    fe: Dict[str, Any] = {}
    for i, (dim, k, s) in enumerate(cfg.conv_feature_layers):
        fe[f"conv_{i}"] = {
            "kernel": _t(sd[f"feature_extractor.conv_layers.{i}.0.weight"]).transpose(2, 1, 0)
        }
        if cfg.extractor_mode == "default" and i == 0:
            fe["gn_0"] = _norm(sd, "feature_extractor.conv_layers.0.2")
        elif cfg.extractor_mode == "layer_norm":
            fe[f"ln_{i}"] = _norm(sd, f"feature_extractor.conv_layers.{i}.2.1")
    params["feature_extractor"] = fe
    if "post_extract_proj.weight" in sd:
        params["post_extract_proj"] = _linear(sd, "post_extract_proj")

    enc: Dict[str, Any] = {}
    w = _fold_weight_norm(
        _t(sd["encoder.pos_conv.0.weight_g"]), _t(sd["encoder.pos_conv.0.weight_v"])
    )
    enc["pos_conv"] = {
        "conv": {"kernel": w.transpose(2, 1, 0), "bias": _t(sd["encoder.pos_conv.0.bias"])}
    }
    enc["layer_norm"] = _norm(sd, "encoder.layer_norm")
    per_layer = []
    for i in range(cfg.encoder_layers):
        p = f"encoder.layers.{i}"
        qkv_w = np.concatenate(
            [_t(sd[f"{p}.self_attn.{n}_proj.weight"]).T for n in ("q", "k", "v")], axis=1
        )
        qkv_b = np.concatenate(
            [_t(sd[f"{p}.self_attn.{n}_proj.bias"]) for n in ("q", "k", "v")], axis=0
        )
        per_layer.append(
            {
                "self_attn": {
                    "qkv": {"kernel": qkv_w, "bias": qkv_b},
                    "out_proj": _linear(sd, f"{p}.self_attn.out_proj"),
                },
                "self_attn_layer_norm": _norm(sd, f"{p}.self_attn_layer_norm"),
                "fc1": _linear(sd, f"{p}.fc1"),
                "fc2": _linear(sd, f"{p}.fc2"),
                "final_layer_norm": _norm(sd, f"{p}.final_layer_norm"),
            }
        )
    enc["layers"] = jax.tree_util.tree_map(lambda *xs: np.stack(xs, 0), *per_layer)
    params["encoder"] = enc

    params["out_expand"] = _linear(sd, "output_layer.0")
    params["split_out"] = {
        "weight": _t(sd["output_layer.2.weight"]),  # [N, Din, Dout]
        "bias": _t(sd["output_layer.2.bias"]).reshape(cfg.n_tasks, -1),
    }
    return params


def load_distiller_checkpoint(path: str):
    """Load a distiller pretraining ckpt -> (DistillerConfig, params).

    Reference layout (s3prl/upstream/distiller/builder.py:41-59): all_states =
    {"Distiller": state_dict, "Config": {"distiller": model kwargs}}.
    """
    import ast as ast_mod

    import torch

    from ..models.distiller import DistillerConfig

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    dcfg = ckpt.get("Config", {}).get("distiller", {}) if isinstance(ckpt, dict) else {}
    sd = ckpt.get("Distiller", ckpt) if isinstance(ckpt, dict) else ckpt
    conv = dcfg.get(
        "extractor_conv_feature_layers",
        "[(512,10,5)] + [(512,3,2)] * 4 + [(512,2,2)] * 2",
    )
    cfg = DistillerConfig(
        conv_feature_layers=tuple(tuple(c) for c in ast_mod.literal_eval(str(conv))),
        extractor_mode=str(dcfg.get("extractor_mode", "default")),
        encoder_layers=int(dcfg.get("encoder_layers", 2)),
        encoder_embed_dim=int(dcfg.get("encoder_embed_dim", 768)),
        encoder_ffn_embed_dim=int(dcfg.get("encoder_ffn_embed_dim", 3072)),
        encoder_attention_heads=int(dcfg.get("encoder_attention_heads", 12)),
        layer_norm_first=bool(dcfg.get("layer_norm_first", False)),
        conv_pos=int(dcfg.get("conv_pos", 128)),
        conv_pos_groups=int(dcfg.get("conv_pos_groups", 16)),
        final_dim=int(dcfg.get("final_dim", 768)),
        n_tasks=int(dcfg.get("n_tasks", 12)),
        out_layer_inter_dim=int(dcfg.get("out_layer_inter_dim", -1)),
    )
    return cfg, distiller_params_from_torch(sd, cfg)


# ---------------------------------------------------------------------------
# APC / VQ-APC (reference: s3prl/upstream/apc — torch GRU stacks)
# ---------------------------------------------------------------------------


def _gru_params_from_torch(sd: Dict[str, Any], prefix: str) -> Dict[str, Any]:
    """torch nn.GRU (single layer) -> flax GRUCell param tree.

    torch packs gates [r; z; n] in weight_ih/hh; flax splits them into
    ir/iz/in (with bias) and hr/hz (no bias)/hn (bias). Matching algebra:
    bias_ir := b_ih_r + b_hh_r (ditto z); in.bias := b_ih_n, hn.bias := b_hh_n.
    """
    w_ih = _t(sd[f"{prefix}.weight_ih_l0"])  # [3H, In]
    w_hh = _t(sd[f"{prefix}.weight_hh_l0"])  # [3H, H]
    b_ih = _t(sd[f"{prefix}.bias_ih_l0"])
    b_hh = _t(sd[f"{prefix}.bias_hh_l0"])
    H = w_hh.shape[1]
    r, z, n = slice(0, H), slice(H, 2 * H), slice(2 * H, 3 * H)
    return {
        "ir": {"kernel": w_ih[r].T, "bias": b_ih[r] + b_hh[r]},
        "iz": {"kernel": w_ih[z].T, "bias": b_ih[z] + b_hh[z]},
        "in": {"kernel": w_ih[n].T, "bias": b_ih[n]},
        "hr": {"kernel": w_hh[r].T},
        "hz": {"kernel": w_hh[z].T},
        "hn": {"kernel": w_hh[n].T, "bias": b_hh[n]},
    }


def apc_params_from_torch(sd: Dict[str, Any], num_layers: int) -> Dict[str, Any]:
    """Map a reference APC state_dict onto models/apc.APCModel."""
    params: Dict[str, Any] = {}
    for i in range(num_layers):
        params[f"cell_{i}"] = _gru_params_from_torch(sd, f"rnn_layers.{i}")
    params["postnet"] = _linear(sd, "postnet")
    g = 0
    while f"vq_layers.{g}.vq_logits.weight" in sd:
        params[f"vq_{g}"] = {
            "vq_logits": _linear(sd, f"vq_layers.{g}.vq_logits"),
            "codebook": _t(sd[f"vq_layers.{g}.codebook_CxE.weight"]).T,
        }
        g += 1
    return params


# ---------------------------------------------------------------------------
# wav2vec 1.0 (reference: s3prl/upstream/wav2vec/wav2vec_model.py —
# ConvFeatureExtractionModel + ConvAggegator state_dicts)
# ---------------------------------------------------------------------------


def wav2vec1_params_from_torch(sd: Dict[str, Any], cfg) -> Dict[str, Any]:
    """Map Wav2VecModel feature_extractor/feature_aggregator weights onto
    models/wav2vec1.Wav2Vec1Model. torch Sequential layout per block:
    extractor [0]=conv [2]=GroupNorm(1,C); aggregator [0]=pad [1]=conv
    [3]=GroupNorm(1,C); residual 1x1 projections under residual_proj.{i}."""
    params: Dict[str, Any] = {}
    for i in range(len(cfg.conv_feature_layers)):
        p = f"feature_extractor.conv_layers.{i}"
        params[f"feat_conv_{i}"] = {"kernel": _t(sd[f"{p}.0.weight"]).transpose(2, 1, 0)}
        if f"{p}.2.weight" in sd:
            params[f"feat_gn_{i}"] = _norm(sd, f"{p}.2")
    for i in range(len(cfg.conv_aggregator_layers)):
        p = f"feature_aggregator.conv_layers.{i}"
        conv = {"kernel": _t(sd[f"{p}.1.weight"]).transpose(2, 1, 0)}
        if f"{p}.1.bias" in sd:
            conv["bias"] = _t(sd[f"{p}.1.bias"])
        params[f"agg_conv_{i}"] = conv
        if f"{p}.3.weight" in sd:
            params[f"agg_gn_{i}"] = _norm(sd, f"{p}.3")
        rp = f"feature_aggregator.residual_proj.{i}.weight"
        if rp in sd:
            params[f"agg_rproj_{i}"] = {"kernel": _t(sd[rp]).transpose(2, 1, 0)}
    # vq-wav2vec quantizers (reference: wav2vec_model.py GumbelVectorQuantizer
    # :1591 in wav2vec2_model.py / KmeansVectorQuantizer :117)
    if "vector_quantizer.vars" in sd:  # gumbel
        vq = {"vars": _t(sd["vector_quantizer.vars"])}
        if "vector_quantizer.weight_proj.weight" in sd:  # depth-1 proj
            vq["weight_proj"] = _linear(sd, "vector_quantizer.weight_proj")
        else:  # depth>1 Sequential: blocks of (Linear, act) then final Linear
            i = 0
            while f"vector_quantizer.weight_proj.{i}.0.weight" in sd:
                vq[f"weight_proj_{i}"] = _linear(sd, f"vector_quantizer.weight_proj.{i}.0")
                i += 1
            vq["weight_proj"] = _linear(sd, f"vector_quantizer.weight_proj.{i}")
        params["vq"] = vq
    elif "vector_quantizer.embedding" in sd:  # kmeans
        params["vq"] = {
            "embedding": _t(sd["vector_quantizer.embedding"]),
            "projection": {
                "kernel": _t(sd["vector_quantizer.projection.0.weight"]).transpose(2, 1, 0)
            },
            "proj_gn": _norm(sd, "vector_quantizer.projection.1"),
        }
    return params


def w2v1_config_from_model_cfg(model_cfg: Dict[str, Any]):
    """Build a Wav2Vec1Config from an s3prl-converted model_cfg dict
    (fields of fairseq's Wav2VecConfig, wav2vec_model.py:289-354)."""
    import ast as ast_mod

    from ..models.wav2vec1 import Wav2Vec1Config

    def layers(key, default):
        val = model_cfg.get(key, default)
        return tuple(tuple(c) for c in ast_mod.literal_eval(val)) if isinstance(val, str) else tuple(
            tuple(c) for c in val
        )

    return Wav2Vec1Config(
        conv_feature_layers=layers(
            "conv_feature_layers",
            "[(512, 10, 5), (512, 8, 4), (512, 4, 2), (512, 4, 2), (512, 4, 2), (512, 1, 1), (512, 1, 1), (512, 1, 1)]",
        ),
        conv_aggregator_layers=layers(
            "conv_aggregator_layers",
            "[" + ", ".join(f"(512, {k}, 1)" for k in range(2, 14)) + "]",
        ),
        log_compression=bool(model_cfg.get("log_compression", True)),
        skip_connections_feat=bool(model_cfg.get("skip_connections_feat", False)),
        skip_connections_agg=bool(model_cfg.get("skip_connections_agg", True)),
        residual_scale=float(model_cfg.get("residual_scale", 0.5)),
        non_affine_group_norm=bool(model_cfg.get("non_affine_group_norm", False)),
        agg_zero_pad=bool(model_cfg.get("agg_zero_pad", False)),
        conv_bias=not bool(model_cfg.get("no_conv_bias", False)),
        vq_type=str(model_cfg.get("vq_type", "none")),
        vq_vars=int(model_cfg.get("vq_vars", 320)),
        vq_groups=int(model_cfg.get("vq_groups", 2)),
        vq_dim=int(model_cfg.get("vq_dim", 0)),
        vq_depth=int(model_cfg.get("vq_depth", 1)),
        combine_groups=bool(model_cfg.get("combine_groups", False)),
    )


def load_wav2vec1_checkpoint(path: str):
    """Load an s3prl-converted wav2vec/vq-wav2vec ckpt
    ({"task_cfg","model_cfg","model_weight"}, reference wav2vec/convert.py)
    -> (Wav2Vec1Config, params)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "model_weight" in ckpt:
        sd = ckpt["model_weight"]
        cfg = w2v1_config_from_model_cfg(ckpt.get("model_cfg", {}))
    else:
        sd = ckpt
        cfg = w2v1_config_from_model_cfg({})
    return cfg, wav2vec1_params_from_torch(sd, cfg)


def _lstm_params_from_torch(sd: Dict[str, Any], prefix: str, layer: int = 0) -> Dict[str, Any]:
    """torch nn.LSTM layer k -> flax OptimizedLSTMCell param tree.

    torch packs gates [i; f; g; o] in weight_ih_l{k}/weight_hh_l{k}; flax
    splits them into ii/if/ig/io (input, no bias) and hi/hf/hg/ho (hidden,
    bias). Matching algebra: h{g}.bias := b_ih_{g} + b_hh_{g}.
    """
    w_ih = _t(sd[f"{prefix}.weight_ih_l{layer}"])  # [4H, In]
    w_hh = _t(sd[f"{prefix}.weight_hh_l{layer}"])  # [4H, H]
    b_ih = _t(sd[f"{prefix}.bias_ih_l{layer}"])
    b_hh = _t(sd[f"{prefix}.bias_hh_l{layer}"])
    H = w_hh.shape[1]
    gates = {"i": slice(0, H), "f": slice(H, 2 * H), "g": slice(2 * H, 3 * H), "o": slice(3 * H, 4 * H)}
    out: Dict[str, Any] = {}
    for g, sl in gates.items():
        out[f"i{g}"] = {"kernel": w_ih[sl].T}
        out[f"h{g}"] = {"kernel": w_hh[sl].T, "bias": b_ih[sl] + b_hh[sl]}
    return out


def _gru_layer_params_from_torch(sd: Dict[str, Any], prefix: str, layer: int) -> Dict[str, Any]:
    """torch nn.GRU layer k -> flax GRUCell param tree (see _gru_params_from_torch)."""
    w_ih = _t(sd[f"{prefix}.weight_ih_l{layer}"])
    w_hh = _t(sd[f"{prefix}.weight_hh_l{layer}"])
    b_ih = _t(sd[f"{prefix}.bias_ih_l{layer}"])
    b_hh = _t(sd[f"{prefix}.bias_hh_l{layer}"])
    H = w_hh.shape[1]
    r, z, n = slice(0, H), slice(H, 2 * H), slice(2 * H, 3 * H)
    return {
        "ir": {"kernel": w_ih[r].T, "bias": b_ih[r] + b_hh[r]},
        "iz": {"kernel": w_ih[z].T, "bias": b_ih[z] + b_hh[z]},
        "in": {"kernel": w_ih[n].T, "bias": b_ih[n]},
        "hr": {"kernel": w_hh[r].T},
        "hz": {"kernel": w_hh[z].T},
        "hn": {"kernel": w_hh[n].T, "bias": b_hh[n]},
    }


# ---------------------------------------------------------------------------
# CPC (reference: s3prl/upstream/cpc — ckpts {"config", "weights"} with
# gEncoder.conv{i}/batchNorm{i} + gAR.baseNet torch RNN weights)
# ---------------------------------------------------------------------------


def cpc_params_from_torch(sd: Dict[str, Any], cfg) -> Dict[str, Any]:
    """Map a CPC {"weights"} state_dict onto models/cpc.CPCModel."""
    params: Dict[str, Any] = {}
    for i in range(5):
        params[f"conv_{i}"] = {
            "kernel": _t(sd[f"gEncoder.conv{i}.weight"]).transpose(2, 1, 0),
            "bias": _t(sd[f"gEncoder.conv{i}.bias"]),
        }
        # ChannelNorm weight/bias are [1, C, 1]
        params[f"norm_{i}"] = {
            "scale": _t(sd[f"gEncoder.batchNorm{i}.weight"]).reshape(-1),
            "bias": _t(sd[f"gEncoder.batchNorm{i}.bias"]).reshape(-1),
        }
    for k in range(cfg.ar_layers):
        if cfg.ar_mode == "lstm":
            params[f"ar_{k}"] = _lstm_params_from_torch(sd, "gAR.baseNet", k)
        else:
            params[f"ar_{k}"] = _gru_layer_params_from_torch(sd, "gAR.baseNet", k)
    return params


def load_cpc_checkpoint(path: str):
    """Load a CPC ckpt ({"config", "weights"}, cpc/expert.py:27-34)
    -> (CPCConfig, params)."""
    import torch

    from ..models.cpc import CPCConfig

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    config = ckpt.get("config", {}) if isinstance(ckpt, dict) else {}
    sd = ckpt.get("weights", ckpt) if isinstance(ckpt, dict) else ckpt
    cfg = CPCConfig(
        hidden_size=int(config.get("hiddenEncoder", 256)),
        ar_size=int(config.get("hiddenGar", 256)),
        ar_layers=int(config.get("nLevelsGRU", 1)),
        ar_mode=str(config.get("arMode", "LSTM")).lower(),
    )
    return cfg, cpc_params_from_torch(sd, cfg)


def _native_pretrain_msgpack(path):
    """Resolve `path` to a restored native param tree, or None if `path` is
    not a native (flax msgpack) checkpoint. Accepts the .msgpack file, a
    Trainer step dir, or a train dir of step_N subdirs (latest wins)."""
    from pathlib import Path as _Path

    p = _Path(path)
    if p.is_dir():
        if (p / "params.msgpack").exists():
            p = p / "params.msgpack"
        else:
            steps = sorted(
                (d for d in p.glob("step_*") if (d / "params.msgpack").exists()),
                key=lambda d: int(d.name.split("_")[1]),
            )
            if not steps:
                return None
            p = steps[-1] / "params.msgpack"
    if p.suffix != ".msgpack":
        return None
    from flax import serialization

    return serialization.msgpack_restore(p.read_bytes())


def load_mel_ssl_checkpoint(name: str, path: str):
    """Load a mel-domain SSL pretraining ckpt -> variables.

    Dispatches by family:
    - NATIVE checkpoints from this framework's own pretrain recipes
      (run_pretrain.py / problem/pretrain.py): a Trainer step dir containing
      `params.msgpack`, an experiment train dir (latest step is picked), or
      the .msgpack file itself — the pretrain task's encoder subtree is
      extracted, closing the reference's pretrain->upstream loop
      (run_downstream.py -u tera -k <ckpt>, runner.py:66-79);
    - apc / vq_apc / npc torch ckpts store {"config", "model"}
      (apc/expert.py:22-27, npc/expert.py:22-26);
    - mockingjay / tera / audio_albert on-the-fly torch ckpts store
      {"SelfSupervisedLearning"/"Transformer": state_dict, config}; raw
      state_dicts with `transformer.`/`encoder.layer.` keys also accepted.
    """
    native = _native_pretrain_msgpack(path)
    if native is not None:
        if name.startswith("npc"):
            # NpcReconstructionTask checkpoints store full variables
            # ({"params": {"npc": ...}, "batch_stats": {"npc": ...}})
            try:
                out = {"params": native["params"]["npc"]}
                if "batch_stats" in native:
                    out["batch_stats"] = native["batch_stats"]["npc"]
                return out
            except KeyError:
                raise ValueError(
                    f"native pretrain checkpoint {path} has top-level keys "
                    f"{sorted(native)} — expected the NPC task layout "
                    "({'params': {'npc': ...}, 'batch_stats': ...})"
                )
        subtree_key = (
            "encoder" if name.startswith(("mockingjay", "tera", "audio_albert"))
            else "apc" if name.startswith(("apc", "vq_apc"))
            else None
        )
        if subtree_key is None or subtree_key not in native:
            raise ValueError(
                f"native pretrain checkpoint {path} has top-level keys "
                f"{sorted(native)} — expected a '{subtree_key}' subtree for "
                f"upstream '{name}' (supported native round trips: "
                "mockingjay/tera/audio_albert, apc/vq_apc, npc)"
            )
        return {"params": native[subtree_key]}

    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)

    if name.startswith(("apc", "vq_apc")):
        sd = ckpt.get("model", ckpt) if isinstance(ckpt, dict) else ckpt
        n = 0
        while f"rnn_layers.{n}.weight_ih_l0" in sd:
            n += 1
        return {"params": apc_params_from_torch(sd, max(n, 1))}
    if name.startswith("npc"):
        from ..models.npc import NPCConfig

        sd = ckpt.get("model", ckpt) if isinstance(ckpt, dict) else ckpt
        paras = (
            ckpt.get("config", {}).get("model", {}).get("paras", {})
            if isinstance(ckpt, dict)
            else {}
        )
        allowed = {f for f in NPCConfig.__dataclass_fields__}
        cfg = NPCConfig(**{k: v for k, v in paras.items() if k in allowed})
        return npc_variables_from_torch(sd, cfg)
    sd = None
    if isinstance(ckpt, dict):
        for key in ("SelfSupervisedLearning", "Transformer", "model", "state_dict"):
            if key in ckpt and isinstance(ckpt[key], dict):
                sd = ckpt[key]
                break
    if sd is None:
        sd = ckpt
    num_layers = 0
    while any(k.startswith(f"encoder.layer.{num_layers}.") or
              k.startswith(f"transformer.encoder.layer.{num_layers}.") for k in sd):
        num_layers += 1
    share_layer = num_layers <= 1 and any("encoder.layer.0." in k for k in sd)
    params = mockingjay_params_from_torch(sd, max(num_layers, 1), share_layer and name == "audio_albert")
    return {"params": params}


# ---------------------------------------------------------------------------
# NPC (reference: s3prl/upstream/npc/npc.py — conv blocks with BatchNorm +
# masked convs; ckpts store {"config", "model"})
# ---------------------------------------------------------------------------


def npc_variables_from_torch(sd: Dict[str, Any], cfg) -> Dict[str, Any]:
    """Map an NPC state_dict onto models/npc.NPCModel (params + batch_stats)."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def conv1d(prefix):
        out = {"kernel": _t(sd[f"{prefix}.weight"]).transpose(2, 1, 0)}
        if f"{prefix}.bias" in sd:
            out["bias"] = _t(sd[f"{prefix}.bias"])
        return out

    def bn(prefix):
        return (
            {"scale": _t(sd[f"{prefix}.weight"]), "bias": _t(sd[f"{prefix}.bias"])},
            {"mean": _t(sd[f"{prefix}.running_mean"]), "var": _t(sd[f"{prefix}.running_var"])},
        )

    for i in range(cfg.n_blocks):
        block_p = {"conv": conv1d(f"blocks.{i}.conv"), "linear": conv1d(f"blocks.{i}.linear")}
        block_s = {}
        if cfg.batch_norm:
            block_p["bn1"], block_s["bn1"] = bn(f"blocks.{i}.bn1")
            block_p["bn2"], block_s["bn2"] = bn(f"blocks.{i}.bn2")
        params[f"block_{i}"] = block_p
        if block_s:
            stats[f"block_{i}"] = block_s
        mc = f"masked_convs.{i}.conv"
        if f"{mc}.weight" in sd:
            params[f"masked_conv_{i}"] = {
                "kernel": _t(sd[f"{mc}.weight"]).transpose(2, 1, 0),
                "bias": _t(sd[f"{mc}.bias"]),
            }
    params["postnet"] = _linear(sd, "postnet")
    out = {"params": params}
    if stats:
        out["batch_stats"] = stats
    return out


# ---------------------------------------------------------------------------
# MR-HuBERT (reference: s3prl/upstream/multires_hubert — s3prl-converted
# ckpts {"task_cfg","model_cfg","model_weight","dictionaries_symbols"})
# ---------------------------------------------------------------------------


def _tx_encoder_params(sd: Dict[str, Any], prefix: str, num_layers: int,
                       pos_conv: bool) -> Dict[str, Any]:
    """One wav2vec2-style TransformerEncoder under `prefix` -> our scanned
    TransformerEncoder param tree."""
    import jax

    enc: Dict[str, Any] = {"layer_norm": _norm(sd, f"{prefix}.layer_norm")}
    if pos_conv:
        w = _fold_weight_norm(
            _t(sd[f"{prefix}.pos_conv.0.weight_g"]), _t(sd[f"{prefix}.pos_conv.0.weight_v"])
        )
        enc["pos_conv"] = {
            "conv": {"kernel": w.transpose(2, 1, 0), "bias": _t(sd[f"{prefix}.pos_conv.0.bias"])}
        }
    per_layer = []
    for i in range(num_layers):
        p = f"{prefix}.layers.{i}"
        qkv_w = np.concatenate(
            [_t(sd[f"{p}.self_attn.{n}_proj.weight"]).T for n in ("q", "k", "v")], axis=1
        )
        qkv_b = np.concatenate(
            [_t(sd[f"{p}.self_attn.{n}_proj.bias"]) for n in ("q", "k", "v")], axis=0
        )
        per_layer.append(
            {
                "self_attn": {
                    "qkv": {"kernel": qkv_w, "bias": qkv_b},
                    "out_proj": _linear(sd, f"{p}.self_attn.out_proj"),
                },
                "self_attn_layer_norm": _norm(sd, f"{p}.self_attn_layer_norm"),
                "fc1": _linear(sd, f"{p}.fc1"),
                "fc2": _linear(sd, f"{p}.fc2"),
                "final_layer_norm": _norm(sd, f"{p}.final_layer_norm"),
            }
        )
    enc["layers"] = jax.tree_util.tree_map(lambda *xs: np.stack(xs, 0), *per_layer)
    return enc


def _gnconv_params(sd: Dict[str, Any], prefix: str, transpose: bool) -> Dict[str, Any]:
    """ConvAdapter half: Sequential([0]=conv, [2]=Fp32GroupNorm) -> _GNConv."""
    w = _t(sd[f"{prefix}.0.weight"])
    if transpose:  # torch ConvTranspose1d [in, out, k] -> flax [k, in, out], flipped
        kernel = w.transpose(2, 0, 1)[::-1].copy()
    else:  # torch Conv1d [out, in, k] -> flax [k, in, out]
        kernel = w.transpose(2, 1, 0)
    return {"conv": {"kernel": kernel}, "norm": _norm(sd, f"{prefix}.2")}


def multires_hubert_params_from_torch(sd: Dict[str, Any], cfg) -> Dict[str, Any]:
    """Map a MultiresHubertModel state_dict onto models/multires_hubert."""
    params: Dict[str, Any] = {}
    fe: Dict[str, Any] = {}
    for i, (dim, k, s) in enumerate(cfg.conv_feature_layers):
        conv = {"kernel": _t(sd[f"feature_extractor.conv_layers.{i}.0.weight"]).transpose(2, 1, 0)}
        if cfg.conv_bias:
            conv["bias"] = _t(sd[f"feature_extractor.conv_layers.{i}.0.bias"])
        fe[f"conv_{i}"] = conv
        if cfg.extractor_mode == "layer_norm":
            fe[f"ln_{i}"] = _norm(sd, f"feature_extractor.conv_layers.{i}.2.1")
        elif cfg.extractor_mode == "default" and i == 0:
            fe["gn_0"] = _norm(sd, "feature_extractor.conv_layers.0.2")
    params["feature_extractor"] = fe
    params["layer_norm"] = _norm(sd, "layer_norm")
    if "post_extract_proj.weight" in sd:
        params["post_extract_proj"] = _linear(sd, "post_extract_proj")

    blocks = cfg.block_layers
    n = cfg.n_pairs
    for i in range(n):
        params[f"encoders_{i}"] = _tx_encoder_params(
            sd, f"encoders.{i}", blocks[i], pos_conv=(i == 0)
        )
        params[f"decoders_{i}"] = _tx_encoder_params(
            sd, f"decoders.{i}", blocks[n + 1 + i], pos_conv=False
        )
        if cfg.use_plain_updownsample:
            params[f"downsample_{i}"] = {
                "downsample_conv": _gnconv_params(
                    sd, f"downsample_modules.{i}.downsample_conv", transpose=False
                )
            }
            params[f"upsample_{i}"] = {
                "upsample_conv": _gnconv_params(
                    sd, f"upsample_modules.{i}.upsample_conv", transpose=True
                )
            }
        else:
            for ours, theirs in ((f"downsample_{i}", f"downsample_modules.{i}"),
                                 (f"upsample_{i}", f"upsample_modules.{i}")):
                params[ours] = {
                    "upsample_conv": _gnconv_params(sd, f"{theirs}.upsample_conv", True),
                    "downsample_conv": _gnconv_params(sd, f"{theirs}.downsample_conv", False),
                }
    params["middle_encoder"] = _tx_encoder_params(
        sd, "middle_encoder", blocks[n], pos_conv=(n == 0)
    )
    return params


def multires_config_from_model_cfg(model_cfg: Dict[str, Any], task_cfg: Dict[str, Any] = None):
    import ast as ast_mod

    from ..models.multires_hubert import MultiresHubertConfig

    conv = model_cfg.get("conv_feature_layers")
    if isinstance(conv, str):
        conv = tuple(tuple(c) for c in ast_mod.literal_eval(conv))
    elif conv is not None:
        conv = tuple(tuple(c) for c in conv)
    override = model_cfg.get("override_encoder_layers", "")
    kwargs = dict(
        extractor_mode=model_cfg.get("extractor_mode", "default"),
        conv_bias=model_cfg.get("conv_bias", False),
        encoder_embed_dim=model_cfg.get("encoder_embed_dim", 768),
        encoder_ffn_embed_dim=model_cfg.get("encoder_ffn_embed_dim", 3072),
        encoder_attention_heads=model_cfg.get("encoder_attention_heads", 12),
        activation_fn=model_cfg.get("activation_fn", "gelu"),
        layer_norm_first=model_cfg.get("layer_norm_first", False),
        conv_pos=model_cfg.get("conv_pos", 128),
        conv_pos_groups=model_cfg.get("conv_pos_groups", 16),
        label_rate_ratios=tuple(model_cfg.get("label_rate_ratios", (1, 2))),
        encoder_layers=int(model_cfg.get("encoder_layers", 2)),
        override_encoder_layers=tuple(ast_mod.literal_eval(override)) if override else (),
        conv_adapator_kernal=int(model_cfg.get("conv_adapator_kernal", 7)),
        use_plain_updownsample=bool(model_cfg.get("use_plain_updownsample", False)),
        dropout=model_cfg.get("dropout", 0.1),
        attention_dropout=model_cfg.get("attention_dropout", 0.1),
        activation_dropout=model_cfg.get("activation_dropout", 0.0),
        dropout_input=model_cfg.get("dropout_input", 0.1),
        normalize=(task_cfg or {}).get("normalize", False),
    )
    if conv is not None:
        kwargs["conv_feature_layers"] = conv
    return MultiresHubertConfig(**kwargs)


def load_multires_hubert_checkpoint(path: str):
    """Load an s3prl-converted MR-HuBERT ckpt -> (MultiresHubertConfig, params)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    cfg = multires_config_from_model_cfg(ckpt.get("model_cfg", {}), ckpt.get("task_cfg", {}))
    return cfg, multires_hubert_params_from_torch(ckpt["model_weight"], cfg)


# ---------------------------------------------------------------------------
# DeCoAR 1 (reference: s3prl/upstream/decoar/decoar.py — {"model"} ckpts with
# a 4-layer nn.LSTM per direction; decoar_layers uses ModuleLists of
# single-layer LSTMs with the same math)
# ---------------------------------------------------------------------------


def decoar_params_from_torch(sd: Dict[str, Any], num_layers: int = 4) -> Dict[str, Any]:
    """Map a Decoar state_dict onto models/decoar.DecoarModel (both the
    `forward_lstm.weight_ih_l{k}` and `forward_lstms.{k}.weight_ih_l0`
    naming variants)."""
    params: Dict[str, Any] = {"post_extract_proj": _linear(sd, "post_extract_proj")}
    for i in range(num_layers):
        if f"forward_lstm.weight_ih_l{i}" in sd:
            params[f"fwd_{i}"] = _lstm_params_from_torch(sd, "forward_lstm", i)
            params[f"bwd_{i}"] = _lstm_params_from_torch(sd, "backward_lstm", i)
        else:
            params[f"fwd_{i}"] = _lstm_params_from_torch(sd, f"forward_lstms.{i}", 0)
            params[f"bwd_{i}"] = _lstm_params_from_torch(sd, f"backward_lstms.{i}", 0)
    return params


def load_decoar_checkpoint(path: str) -> Dict[str, Any]:
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model", ckpt) if isinstance(ckpt, dict) else ckpt
    return decoar_params_from_torch(sd)


# ---------------------------------------------------------------------------
# DeCoAR 2.0 (reference: s3prl/upstream/decoar2 — {"model"} ckpts reusing
# the wav2vec2 TransformerEncoder names)
# ---------------------------------------------------------------------------


def decoar2_params_from_torch(sd: Dict[str, Any]) -> Dict[str, Any]:
    import jax

    params: Dict[str, Any] = {"post_extract_proj": _linear(sd, "post_extract_proj")}
    enc: Dict[str, Any] = {}
    w = _fold_weight_norm(
        _t(sd["encoder.pos_conv.0.weight_g"]), _t(sd["encoder.pos_conv.0.weight_v"])
    )
    enc["pos_conv"] = {
        "conv": {"kernel": w.transpose(2, 1, 0), "bias": _t(sd["encoder.pos_conv.0.bias"])}
    }
    enc["layer_norm"] = _norm(sd, "encoder.layer_norm")
    per_layer = []
    i = 0
    while f"encoder.layers.{i}.fc1.weight" in sd:
        p = f"encoder.layers.{i}"
        qkv_w = np.concatenate(
            [_t(sd[f"{p}.self_attn.{n}_proj.weight"]).T for n in ("q", "k", "v")], axis=1
        )
        qkv_b = np.concatenate(
            [_t(sd[f"{p}.self_attn.{n}_proj.bias"]) for n in ("q", "k", "v")], axis=0
        )
        per_layer.append(
            {
                "self_attn": {
                    "qkv": {"kernel": qkv_w, "bias": qkv_b},
                    "out_proj": _linear(sd, f"{p}.self_attn.out_proj"),
                },
                "self_attn_layer_norm": _norm(sd, f"{p}.self_attn_layer_norm"),
                "fc1": _linear(sd, f"{p}.fc1"),
                "fc2": _linear(sd, f"{p}.fc2"),
                "final_layer_norm": _norm(sd, f"{p}.final_layer_norm"),
            }
        )
        i += 1
    enc["layers"] = jax.tree_util.tree_map(lambda *xs: np.stack(xs, 0), *per_layer)
    params["encoder"] = enc
    return params


def load_decoar2_checkpoint(path: str) -> Dict[str, Any]:
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model", ckpt) if isinstance(ckpt, dict) else ckpt
    return decoar2_params_from_torch(sd)


# ---------------------------------------------------------------------------
# MOS predictor (reference: s3prl/upstream/mos_prediction — ckpts
# {"Upstream","Featurizer","Downstream","Config"}, expert.py:82-109)
# ---------------------------------------------------------------------------


def _find_config_value(tree, key):
    """Depth-first search a nested config dict for `key` -> int | None."""
    if isinstance(tree, dict):
        if key in tree and isinstance(tree[key], int):
            return tree[key]
        for v in tree.values():
            found = _find_config_value(v, key)
            if found is not None:
                return found
    return None


def load_mos_checkpoint(path: str):
    """Load a mos_{wav2vec2,apc,tera} ckpt -> (MosConfig, params).

    The Upstream entry is the finetuned upstream expert's state_dict:
    "model."-prefixed wav2vec2 (mos_prediction/expert.py:82-95), a
    "model."-prefixed APC (apc/expert.py:26), or a "transformer."-prefixed
    TransformerModel (tera/mockingjay expert). The variant is detected from
    the state-dict key shapes."""
    import torch

    from ..models.apc import APCConfig
    from ..models.mockingjay import MockingjayConfig
    from ..models.mos import MosConfig

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    up_sd = {
        (k[len("model."):] if k.startswith("model.") else k): v
        for k, v in ckpt["Upstream"].items()
    }
    modelrc = (
        ckpt.get("Config", {}).get("downstream_expert", {}).get("modelrc", {})
    )
    down_sd = ckpt["Downstream"]

    common = dict(
        projector_dim=int(modelrc.get("projector_dim", down_sd["connector.weight"].shape[0])),
        clipping=bool(modelrc.get("clipping", False)),
        attention_pooling=bool(modelrc.get("attention_pooling", False)),
    )
    params: Dict[str, Any] = {
        "featurizer_weights": _t(ckpt["Featurizer"]["weights"]),
        "connector": _linear(down_sd, "connector"),
        "mean_net_linear": _linear(down_sd, "model.mean_net_linear"),
    }

    if any("rnn_layers" in k for k in up_sd):  # mos_apc
        n = 0
        while f"rnn_layers.{n}.weight_ih_l0" in up_sd:
            n += 1
        hidden = up_sd["rnn_layers.0.weight_hh_l0"].shape[1]
        in_dim = up_sd["postnet.weight"].shape[0]
        cfg = MosConfig(
            upstream="apc",
            apc=APCConfig(input_size=in_dim, hidden_size=hidden, num_layers=max(n, 1)),
            feat_kind="mel", **common,
        )
        params["apc"] = apc_params_from_torch(up_sd, max(n, 1))
    elif any("spec_transform" in k for k in up_sd):  # mos_tera
        sd = up_sd
        if any(k.startswith("transformer.") for k in sd):
            sd = {k[len("transformer."):]: v for k, v in sd.items()
                  if k.startswith("transformer.")}
        n = 0
        while any(k.startswith(f"encoder.layer.{n}.") for k in sd):
            n += 1
        w = sd["input_representations.spec_transform.weight"]
        hidden, in_dim = int(w.shape[0]), int(w.shape[1])
        inter = int(sd["encoder.layer.0.intermediate.dense.weight"].shape[0])
        # prefer the head count stored in the checkpoint's Config (heads are
        # not recoverable from weight shapes); fall back to the published
        # mos_tera layout, TERA-Base (768/12)
        heads = _find_config_value(ckpt.get("Config", {}), "num_attention_heads")
        if heads is None:
            heads = 12 if hidden % 12 == 0 else 4
        cfg = MosConfig(
            upstream="tera",
            tera=MockingjayConfig(input_dim=in_dim, hidden_size=hidden,
                                  num_hidden_layers=max(n, 1),
                                  num_attention_heads=heads,
                                  intermediate_size=inter),
            feat_kind="fbank_delta" if in_dim == 240 else "mel", **common,
        )
        params["tera"] = mockingjay_params_from_torch(sd, max(n, 1))
    else:  # mos_wav2vec2 — released MOS rides wav2vec2-Base
        trunk_cfg = config_from_model_cfg({})
        cfg = MosConfig(trunk=trunk_cfg, **common)
        params["trunk"] = trunk_params_from_torch(up_sd, trunk_cfg)

    if cfg.attention_pooling:
        params["mean_net_pooling"] = _linear(down_sd, "model.mean_net_pooling.W")
    return cfg, params


# ---------------------------------------------------------------------------
# RoBERTa (reference: s3prl/upstream/roberta — s3prl-converted ckpts
# {"task_cfg","model_cfg"(Namespace),"model_weight","text_dictionary"})
# ---------------------------------------------------------------------------


def roberta_params_from_torch(sd: Dict[str, Any], num_layers: int) -> Dict[str, Any]:
    """Map a fairseq RobertaModel state_dict (encoder.sentence_encoder.*)
    onto models/roberta.RobertaModel."""
    pref = "encoder.sentence_encoder."
    if not any(k.startswith(pref) for k in sd):
        pref = ""  # bare sentence-encoder state_dict
    ln_key = (
        f"{pref}layernorm_embedding"
        if f"{pref}layernorm_embedding.weight" in sd
        else f"{pref}emb_layer_norm"
    )
    params: Dict[str, Any] = {
        "embed_tokens": {"embedding": _t(sd[f"{pref}embed_tokens.weight"])},
        "embed_positions": {"embedding": _t(sd[f"{pref}embed_positions.weight"])},
        "emb_layer_norm": _norm(sd, ln_key),
    }
    for i in range(num_layers):
        p = f"{pref}layers.{i}"
        qkv_w = np.concatenate(
            [_t(sd[f"{p}.self_attn.{n}_proj.weight"]).T for n in ("q", "k", "v")], axis=1
        )
        qkv_b = np.concatenate(
            [_t(sd[f"{p}.self_attn.{n}_proj.bias"]) for n in ("q", "k", "v")], axis=0
        )
        params[f"layer_{i}"] = {
            "self_attn": {
                "qkv": {"kernel": qkv_w, "bias": qkv_b},
                "out_proj": _linear(sd, f"{p}.self_attn.out_proj"),
            },
            "self_attn_layer_norm": _norm(sd, f"{p}.self_attn_layer_norm"),
            "fc1": _linear(sd, f"{p}.fc1"),
            "fc2": _linear(sd, f"{p}.fc2"),
            "final_layer_norm": _norm(sd, f"{p}.final_layer_norm"),
        }
    return params


def parse_fairseq_dictionary(text: str, num_codes: int = 320):
    """Parse a fairseq dict.txt of "g0-g1 count" code-pair symbols into an
    int lookup [num_codes, num_codes] -> token id (specials: <s>=0 <pad>=1
    </s>=2 <unk>=3, then symbols in file order; Dictionary.load semantics)."""
    lookup = np.full((num_codes, num_codes), 3, np.int32)  # default <unk>
    idx = 4
    for line in text.splitlines():
        line = line.strip()
        if not line:
            continue
        sym = line.rsplit(" ", 1)[0]
        parts = sym.split("-")
        if len(parts) == 2 and parts[0].isdigit() and parts[1].isdigit():
            a, b = int(parts[0]), int(parts[1])
            if a < num_codes and b < num_codes:
                lookup[a, b] = idx
        idx += 1
    return lookup, idx + 1  # +1 for the appended <mask>


def load_roberta_checkpoint(path: str):
    """Load an s3prl-converted roberta ckpt -> (RobertaConfig, params, lookup)."""
    import torch

    from ..models.roberta import RobertaConfig

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt["model_weight"]
    mc = ckpt.get("model_cfg")
    mc = vars(mc) if mc is not None and not isinstance(mc, dict) else (mc or {})
    tok_w = _t(sd.get("encoder.sentence_encoder.embed_tokens.weight",
                      sd.get("embed_tokens.weight")))
    pos_w = _t(sd.get("encoder.sentence_encoder.embed_positions.weight",
                      sd.get("embed_positions.weight")))
    pad_idx = 1
    cfg = RobertaConfig(
        vocab_size=tok_w.shape[0],
        max_positions=pos_w.shape[0] - pad_idx - 1,
        hidden_size=int(mc.get("encoder_embed_dim", tok_w.shape[1])),
        num_layers=int(mc.get("encoder_layers", 12)),
        num_heads=int(mc.get("encoder_attention_heads", 12)),
        ffn_size=int(mc.get("encoder_ffn_embed_dim", 3072)),
        dropout=float(mc.get("dropout", 0.1)),
        attention_dropout=float(mc.get("attention_dropout", 0.1)),
        activation_dropout=float(mc.get("activation_dropout", 0.0)),
        pad_idx=pad_idx,
    )
    params = roberta_params_from_torch(sd, cfg.num_layers)
    lookup = None
    if "text_dictionary" in ckpt:
        lookup, _ = parse_fairseq_dictionary(ckpt["text_dictionary"])
    return cfg, params, lookup


# ---------------------------------------------------------------------------
# AST / SSAST (reference: s3prl/upstream/ssast/ast_models.py — timm ViT
# state_dicts: patch_embed.proj, cls_token, pos_embed, blocks.{i}.*)
# ---------------------------------------------------------------------------


def ast_params_from_torch(sd: Dict[str, Any], depth: int = 12) -> Dict[str, Any]:
    """Map a timm-format ViT/AST state_dict onto models/ast.ASTEncoder.

    Prefix-tolerant: accepts both bare timm keys and the reference's
    `v.`-prefixed (module.v) layout. No parity test is possible in this
    environment (the reference AST requires the timm package, absent here);
    the mapping is validated structurally by the roundtrip unit test.
    """
    if any(k.startswith("v.") for k in sd):
        sd = {k[2:]: v for k, v in sd.items() if k.startswith("v.")} | {
            k: v for k, v in sd.items() if not k.startswith("v.")
        }
    params: Dict[str, Any] = {
        # timm conv2d [out, in, kh, kw] -> flax [kh, kw, in, out]
        "patch_embed": {
            "kernel": _t(sd["patch_embed.proj.weight"]).transpose(2, 3, 1, 0),
            "bias": _t(sd["patch_embed.proj.bias"]),
        },
        "cls_token": _t(sd["cls_token"]).reshape(1, 1, -1),
        "pos_embed": _t(sd["pos_embed"]),
        "norm": _norm(sd, "norm"),
    }
    for i in range(depth):
        p = f"blocks.{i}"
        params[f"block_{i}"] = {
            "self_attn_layer_norm": _norm(sd, f"{p}.norm1"),
            "self_attn": {
                "qkv": _linear(sd, f"{p}.attn.qkv"),
                "out_proj": _linear(sd, f"{p}.attn.proj"),
            },
            "final_layer_norm": _norm(sd, f"{p}.norm2"),
            "fc1": _linear(sd, f"{p}.mlp.fc1"),
            "fc2": _linear(sd, f"{p}.mlp.fc2"),
        }
    return params


def lighthubert_params_from_torch(sd: Dict[str, Any], cfg) -> Dict[str, Any]:
    """Slice a LightHuBERT supernet state_dict down to a fixed subnet.

    Every scaling module samples a weight prefix (scaling_linear.py:76-103,
    scaling_conv.py:57-63), so subnet extraction is host-side slicing:
    q/k/v [:A, :E], out_proj [:E, :A], fc1 [:F, :E], fc2 [:E, :F],
    norms [:E]; the pos conv folds weight norm on the FULL supernet weight
    first, then slices [:E, :E/groups].
    """
    import jax

    E, F = cfg.embed_dim, cfg.ffn_dim
    A = cfg.num_heads * 64  # head dim is fixed at 64 (scaling_multihead.py:156)

    # fc1/fc2 share weights across FFN ratios: the supernet FFN dim is split
    # into (supernet_ffn // supernet_embed) blocks and a subnet takes the
    # first sample_embed rows/cols OF EACH block (scaling_transformer.py:80-90
    # + scaling_linear.py:104-131), not a plain prefix.
    E_super = _t(sd["post_extract_proj.weight"]).shape[0]

    def _ffn_rows(w_full: np.ndarray) -> np.ndarray:
        F_super = w_full.shape[0]
        n_blocks_super = F_super // E_super
        block = F_super // n_blocks_super  # == E_super
        sample_splits = F / E
        size_split = int(F / sample_splits)  # == E
        idx = []
        import math as _math

        for i in range(int(_math.ceil(sample_splits))):
            take = min(size_split, F - i * size_split)
            idx.extend(range(i * block, i * block + take))
        return w_full[np.asarray(idx)]

    params: Dict[str, Any] = {}
    fe: Dict[str, Any] = {}
    for i, (dim, k, s) in enumerate(cfg.conv_feature_layers):
        conv = {"kernel": _t(sd[f"feature_extractor.conv_layers.{i}.0.weight"]).transpose(2, 1, 0)}
        if cfg.conv_bias:
            conv["bias"] = _t(sd[f"feature_extractor.conv_layers.{i}.0.bias"])
        fe[f"conv_{i}"] = conv
        if cfg.extractor_mode == "layer_norm":
            fe[f"ln_{i}"] = _norm(sd, f"feature_extractor.conv_layers.{i}.2.1")
        elif cfg.extractor_mode == "default" and i == 0:
            fe["gn_0"] = _norm(sd, "feature_extractor.conv_layers.0.2")
    params["feature_extractor"] = fe
    params["layer_norm"] = _norm(sd, "layer_norm")
    params["post_extract_proj"] = {
        "kernel": _t(sd["post_extract_proj.weight"])[:E].T,
        "bias": _t(sd["post_extract_proj.bias"])[:E],
    }

    enc: Dict[str, Any] = {}
    w = _fold_weight_norm(
        _t(sd["encoder.pos_conv.0.weight_g"]), _t(sd["encoder.pos_conv.0.weight_v"])
    )  # [out, in/groups, k], folded over the full supernet weight
    enc["pos_conv"] = {
        "conv": {
            "kernel": w[:E, : E // cfg.conv_pos_groups].transpose(2, 1, 0),
            "bias": _t(sd["encoder.pos_conv.0.bias"])[:E],
        }
    }
    ln = _norm(sd, "encoder.layer_norm")
    enc["layer_norm"] = {"scale": ln["scale"][:E], "bias": ln["bias"][:E]}

    per_layer = []
    for i in range(cfg.num_layers):
        p = f"encoder.layers.{i}"
        qkv_w = np.concatenate(
            [_t(sd[f"{p}.self_attn.{n}_proj.weight"])[:A, :E].T for n in ("q", "k", "v")],
            axis=1,
        )
        qkv_b = np.concatenate(
            [_t(sd[f"{p}.self_attn.{n}_proj.bias"])[:A] for n in ("q", "k", "v")], axis=0
        )

        def norm_e(prefix):
            n = _norm(sd, prefix)
            return {"scale": n["scale"][:E], "bias": n["bias"][:E]}

        per_layer.append(
            {
                "self_attn": {
                    "qkv": {"kernel": qkv_w, "bias": qkv_b},
                    "out_proj": {
                        "kernel": _t(sd[f"{p}.self_attn.out_proj.weight"])[:E, :A].T,
                        "bias": _t(sd[f"{p}.self_attn.out_proj.bias"])[:E],
                    },
                },
                "self_attn_layer_norm": norm_e(f"{p}.self_attn_layer_norm"),
                "fc1": {
                    "kernel": _ffn_rows(_t(sd[f"{p}.fc1.weight"]))[:, :E].T,
                    "bias": _ffn_rows(_t(sd[f"{p}.fc1.bias"])[:, None])[:, 0],
                },
                "fc2": {
                    # torch [E_out, F_in] -> rows :E, block-gathered cols;
                    # transposing first puts cols on axis 0 for _ffn_rows and
                    # lands directly in the flax [in, out] kernel layout
                    "kernel": _ffn_rows(_t(sd[f"{p}.fc2.weight"])[:E].T),
                    "bias": _t(sd[f"{p}.fc2.bias"])[:E],
                },
                "final_layer_norm": norm_e(f"{p}.final_layer_norm"),
            }
        )
    enc["layers"] = jax.tree_util.tree_map(lambda *xs: np.stack(xs, 0), *per_layer)
    params["encoder"] = enc
    return params


def load_lighthubert_checkpoint(path: str):
    """Load a LightHuBERT ckpt -> (LightHubertConfig, params), replicating the
    expert's subnet choice (expert.py:23-44): pruner ckpts use the fixed
    published subnet of their supernet type, students use the max subnet."""
    import ast as ast_mod

    import torch

    from ..models.lighthubert import (
        SUBNET_BASE,
        SUBNET_BASE_MAX,
        SUBNET_SMALL,
        SUBNET_SMALL_MAX,
        LightHubertConfig,
    )

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    model_cfg = ckpt.get("cfg", {}).get("model", {}) if isinstance(ckpt, dict) else {}
    sd = ckpt.get("model", ckpt) if isinstance(ckpt, dict) else ckpt

    supernet_type = str(model_cfg.get("supernet_type", "base")).lower()
    pruner_supernet = str(model_cfg.get("pruner_supernet", "")).lower()
    if pruner_supernet.endswith("small.yaml"):
        supernet_type = "small"
    elif pruner_supernet.endswith("base.yaml"):
        supernet_type = "base"
    name = model_cfg.get("_name", "hubert_pruner")
    if name == "student_hubert":
        subnet = SUBNET_BASE_MAX if supernet_type == "base" else SUBNET_SMALL_MAX
    else:
        subnet = SUBNET_BASE if supernet_type == "base" else SUBNET_SMALL

    conv = model_cfg.get("conv_feature_layers", "[(512,10,5)] + [(512,3,2)] * 4 + [(512,2,2)] * 2")
    cfg = LightHubertConfig(
        conv_feature_layers=tuple(tuple(c) for c in ast_mod.literal_eval(str(conv)))
        if isinstance(conv, str) else tuple(tuple(c) for c in conv),
        extractor_mode=str(model_cfg.get("extractor_mode", "layer_norm")),
        conv_bias=bool(model_cfg.get("conv_bias", False)),
        embed_dim=subnet["embed_dim"],
        num_heads=subnet["heads_num"],
        ffn_dim=subnet["ffn_embed"],
        num_layers=subnet["layer_num"],
        conv_pos=int(model_cfg.get("conv_pos", 128)),
        conv_pos_groups=int(model_cfg.get("conv_pos_groups", 16)),
        layer_norm_first=bool(model_cfg.get("layer_norm_first", False)),
    )
    return cfg, lighthubert_params_from_torch(sd, cfg)


def byol_variables_from_torch(sd: Dict[str, Any]) -> Dict[str, Any]:
    """Map an AudioNTT2020 state_dict (byol_a/byol_s ckpts) onto
    models/byol.AudioNTT2020 under the ByolModel "net" scope.

    Key normalization mirrors the reference load_weight (byol_a.py:60-77):
    keep only `features.*` / `fc.*` suffixes regardless of wrapper prefix.
    """
    import re

    norm = {}
    for k, v in sd.items():
        m = re.search(r"(^fc\.|\.fc\.|^features\.|\.features\.)", k)
        if m is None:
            continue
        nk = k[m.start():]
        norm[nk[1:] if nk.startswith(".") else nk] = v
    sd = norm

    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    for i, idx in enumerate((0, 4, 8)):  # Sequential conv positions
        params[f"conv_{i}"] = {
            "kernel": _t(sd[f"features.{idx}.weight"]).transpose(2, 3, 1, 0),
            "bias": _t(sd[f"features.{idx}.bias"]),
        }
        params[f"bn_{i}"] = _norm(sd, f"features.{idx + 1}")
        stats[f"bn_{i}"] = {
            "mean": _t(sd[f"features.{idx + 1}.running_mean"]),
            "var": _t(sd[f"features.{idx + 1}.running_var"]),
        }
    params["fc1"] = _linear(sd, "fc.0")
    params["fc2"] = _linear(sd, "fc.3")
    return {"params": {"net": params}, "batch_stats": {"net": stats}}


def _conv2d(sd: Dict[str, Any], prefix: str, bias: bool = True) -> Dict[str, Any]:
    out = {"kernel": _t(sd[f"{prefix}.weight"]).transpose(2, 3, 1, 0)}
    if bias and f"{prefix}.bias" in sd:
        out["bias"] = _t(sd[f"{prefix}.bias"])
    return out


def _bn2d(sd: Dict[str, Any], prefix: str):
    """BatchNorm2d -> (params, batch_stats)."""
    return (
        _norm(sd, prefix),
        {"mean": _t(sd[f"{prefix}.running_mean"]), "var": _t(sd[f"{prefix}.running_var"])},
    )


def resnetish34_variables_from_torch(sd: Dict[str, Any]) -> Dict[str, Any]:
    """Map a serab_byols resnetish34 state_dict (resnetish.py:176-312) onto
    models/byol.ResNetish34 under the ByolModel "net" scope."""
    params: Dict[str, Any] = {"conv1": _conv2d(sd, "conv1", bias=False)}
    stats: Dict[str, Any] = {}
    params["bn1"], stats["bn1"] = _bn2d(sd, "bn1")
    for li, blocks in enumerate([3, 4, 6, 3]):
        for b in range(blocks):
            p = f"layer{li + 1}.{b}"
            blk: Dict[str, Any] = {"conv1": _conv2d(sd, f"{p}.conv1", bias=False),
                                   "conv2": _conv2d(sd, f"{p}.conv2", bias=False)}
            bstats: Dict[str, Any] = {}
            blk["bn1"], bstats["bn1"] = _bn2d(sd, f"{p}.bn1")
            blk["bn2"], bstats["bn2"] = _bn2d(sd, f"{p}.bn2")
            if f"{p}.downsample.0.weight" in sd:
                blk["down_conv"] = _conv2d(sd, f"{p}.downsample.0", bias=False)
                blk["down_bn"], bstats["down_bn"] = _bn2d(sd, f"{p}.downsample.1")
            name = f"layer{li + 1}_{b}"
            params[name] = blk
            stats[name] = bstats
    return {"params": {"net": params}, "batch_stats": {"net": stats}}


def _cvt_ln(sd: Dict[str, Any], prefix: str) -> Dict[str, Any]:
    return {"g": _t(sd[f"{prefix}.g"]).reshape(-1), "b": _t(sd[f"{prefix}.b"]).reshape(-1)}


def _cvt_dwconv(sd: Dict[str, Any], prefix: str):
    """DepthWiseConv2d (cvt.py:86-105): net.0 dw conv, net.1 BN, net.2 pw."""
    params = {
        "dw": _conv2d(sd, f"{prefix}.net.0"),
        "pw": _conv2d(sd, f"{prefix}.net.2"),
    }
    params["bn"], stats = _bn2d(sd, f"{prefix}.net.1")
    return params, {"bn": stats}


def cvt_variables_from_torch(sd: Dict[str, Any], depths=(1, 1, 1)) -> Dict[str, Any]:
    """Map a serab_byols CvT state_dict (cvt.py:199-323; the model is one
    nn.Sequential: per stage [conv, LayerNorm, Transformer]) onto
    models/byol.CvT under the ByolModel "net" scope."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    for si, depth in enumerate(depths):
        params[f"s{si}_embed"] = _conv2d(sd, f"layers.{si}.0")
        params[f"s{si}_ln"] = _cvt_ln(sd, f"layers.{si}.1")
        for d in range(depth):
            base = f"layers.{si}.2.layers.{d}"
            params[f"s{si}_attn{d}_norm"] = _cvt_ln(sd, f"{base}.0.norm")
            attn: Dict[str, Any] = {}
            astats: Dict[str, Any] = {}
            attn["to_q"], astats["to_q"] = _cvt_dwconv(sd, f"{base}.0.fn.to_q")
            attn["to_kv"], astats["to_kv"] = _cvt_dwconv(sd, f"{base}.0.fn.to_kv")
            attn["to_out"] = _conv2d(sd, f"{base}.0.fn.to_out.0")
            params[f"s{si}_attn{d}"] = attn
            stats[f"s{si}_attn{d}"] = astats
            params[f"s{si}_ff{d}_norm"] = _cvt_ln(sd, f"{base}.1.norm")
            params[f"s{si}_ff{d}"] = {
                "fc1": _conv2d(sd, f"{base}.1.fn.net.0"),
                "fc2": _conv2d(sd, f"{base}.1.fn.net.3"),
            }
    return {"params": {"net": params}, "batch_stats": {"net": stats}}


def load_byol_checkpoint(path: str) -> Dict[str, Any]:
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "state_dict" in ckpt:
        ckpt = ckpt["state_dict"]
    if any(k.startswith("layer1.") for k in ckpt):
        return resnetish34_variables_from_torch(ckpt)
    if any(".to_q." in k for k in ckpt):
        return cvt_variables_from_torch(ckpt)
    return byol_variables_from_torch(ckpt)


def passt_params_from_torch(sd: Dict[str, Any], depth: int = 12) -> Dict[str, Any]:
    """Map a hear21passt PaSST state_dict onto models/passt.PasstNet
    (reference: upstream/passt/hear21passt/models/passt.py:511-772)."""
    # accept wrapper-level dicts ({"net.*", "mel.*"}) and bare net dicts
    if any(k.startswith("net.") for k in sd):
        sd = {k[len("net."):]: v for k, v in sd.items() if k.startswith("net.")}
    params: Dict[str, Any] = {
        "patch_embed": {
            "kernel": _t(sd["patch_embed.proj.weight"]).transpose(2, 3, 1, 0),
            "bias": _t(sd["patch_embed.proj.bias"]),
        },
        "cls_token": _t(sd["cls_token"]).reshape(1, 1, -1),
        "new_pos_embed": _t(sd["new_pos_embed"]).reshape(1, 1, -1),
        "freq_pos_embed": _t(sd["freq_new_pos_embed"])[0, :, :, 0].T,
        "time_pos_embed": _t(sd["time_new_pos_embed"])[0, :, 0, :].T,
        "norm": _norm(sd, "norm"),
        "head_norm": _norm(sd, "head.0"),
        "head": _linear(sd, "head.1"),
    }
    for i in range(depth):
        p = f"blocks.{i}"
        params[f"block_{i}"] = {
            "self_attn_layer_norm": _norm(sd, f"{p}.norm1"),
            "self_attn": {
                "qkv": _linear(sd, f"{p}.attn.qkv"),
                "out_proj": _linear(sd, f"{p}.attn.proj"),
            },
            "final_layer_norm": _norm(sd, f"{p}.norm2"),
            "fc1": _linear(sd, f"{p}.mlp.fc1"),
            "fc2": _linear(sd, f"{p}.mlp.fc2"),
        }
    return params


def load_passt_checkpoint(path: str, depth: int = 12) -> Dict[str, Any]:
    """Load a PaSST ckpt -> PasstModel params ({"net": ...})."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt
    if isinstance(ckpt, dict) and not any("patch_embed" in k for k in ckpt):
        for key in ("model", "state_dict"):
            if key in ckpt and isinstance(ckpt[key], dict):
                sd = ckpt[key]
                break
    return {"net": passt_params_from_torch(sd, depth=depth)}


def load_ast_checkpoint(path: str, depth: int = 12) -> Dict[str, Any]:
    """Load an SSAST/AST ckpt (raw timm-format state_dict, possibly saved from
    DataParallel with a `module.` prefix; reference ssast/ast_models.py:217)
    -> ASTEncoder params."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt
    if isinstance(ckpt, dict) and not any("patch_embed" in k for k in ckpt):
        for key in ("model", "state_dict", "module"):
            if key in ckpt and isinstance(ckpt[key], dict):
                sd = ckpt[key]
                break
    if any(k.startswith("module.") for k in sd):
        sd = {k[len("module."):]: v for k, v in sd.items()}
    return ast_params_from_torch(sd, depth=depth)


# ---------------------------------------------------------------------------
# ESPnet torchaudio-HuBERT (reference: s3prl/upstream/espnet_hubert/expert.py
# — forwards `model.wav2vec2.extract_features(wavs, lens)[0]`, i.e. a
# torchaudio Wav2Vec2Model whose weights live inside an espnet2 checkpoint
# under `encoder.hubert_pretrain_model.`; hidden states are the L transformer
# LAYER OUTPUTS, with no input-embedding entry)
# ---------------------------------------------------------------------------

_TORCHAUDIO_LAYER_KEYS = {
    "attention.k_proj": "self_attn.k_proj",
    "attention.v_proj": "self_attn.v_proj",
    "attention.q_proj": "self_attn.q_proj",
    "attention.out_proj": "self_attn.out_proj",
    "layer_norm": "self_attn_layer_norm",
    "feed_forward.intermediate_dense": "fc1",
    "feed_forward.output_dense": "fc2",
    "final_layer_norm": "final_layer_norm",
}


def torchaudio_to_fairseq_keys(sd: Dict[str, Any], extractor_mode: str) -> Dict[str, Any]:
    """Rename torchaudio Wav2Vec2Model keys to the fairseq names that
    `trunk_params_from_torch` consumes."""
    out: Dict[str, Any] = {}
    for k, v in sd.items():
        nk = None
        if k.startswith("feature_extractor.conv_layers."):
            parts = k.split(".")
            i, rest = parts[2], ".".join(parts[3:])
            if rest.startswith("conv."):
                nk = f"feature_extractor.conv_layers.{i}.0.{rest[len('conv.'):]}"
            elif rest.startswith("layer_norm."):
                suffix = rest[len("layer_norm."):]
                if extractor_mode == "layer_norm":
                    nk = f"feature_extractor.conv_layers.{i}.2.1.{suffix}"
                else:  # group_norm on layer 0 only
                    nk = f"feature_extractor.conv_layers.{i}.2.{suffix}"
        elif k.startswith("encoder.feature_projection.layer_norm."):
            nk = "layer_norm." + k.rsplit(".", 1)[1]
        elif k.startswith("encoder.feature_projection.projection."):
            nk = "post_extract_proj." + k.rsplit(".", 1)[1]
        elif k.startswith("encoder.transformer.pos_conv_embed.conv."):
            rest = k[len("encoder.transformer.pos_conv_embed.conv."):]
            rest = {
                "parametrizations.weight.original0": "weight_g",
                "parametrizations.weight.original1": "weight_v",
            }.get(rest, rest)
            nk = f"encoder.pos_conv.0.{rest}"
        elif k.startswith("encoder.transformer.layer_norm."):
            nk = "encoder.layer_norm." + k.rsplit(".", 1)[1]
        elif k.startswith("encoder.transformer.layers."):
            parts = k.split(".")
            i = parts[3]
            rest = ".".join(parts[4:-1])
            leaf = parts[-1]
            if rest in _TORCHAUDIO_LAYER_KEYS:
                nk = f"encoder.layers.{i}.{_TORCHAUDIO_LAYER_KEYS[rest]}.{leaf}"
        elif k == "mask_generator.mask_embedding":
            nk = "mask_emb"
        if nk is not None:
            out[nk] = v
    return out


def espnet_hubert_config_from_sd(sd: Dict[str, Any], conf: Dict[str, Any] = None):
    """Infer a Wav2Vec2Config from a (fairseq-renamed) state dict, with
    optional espnet `encoder_conf` overrides (config.yaml)."""
    conf = conf or {}
    # post_extract_proj is absent when conv dim == embed dim (fairseq builds
    # it conditionally); the encoder layer norm always carries C
    C = int(sd["encoder.layer_norm.weight"].shape[0])
    n = 0
    while f"encoder.layers.{n}.fc1.weight" in sd:
        n += 1
    ffn = int(sd["encoder.layers.0.fc1.weight"].shape[0])
    per_layer_ln = "feature_extractor.conv_layers.1.2.1.weight" in sd
    mode = "layer_norm" if per_layer_ln else "default"
    heads = int(conf.get("encoder_num_heads", 12 if C <= 768 else 16))
    lnf = bool(conf.get("encoder_layer_norm_first", C >= 1024))
    conv_bias = "feature_extractor.conv_layers.0.0.bias" in sd
    # conv stack from the weights; stride is 5 on the first layer, 2 after
    # (true of every torchaudio/fairseq hubert extractor), unless the espnet
    # config carries the explicit [[dim, k, stride], ...] table
    if "extractor_conv_layer_config" in conf:
        conv_layers = tuple(tuple(t) for t in conf["extractor_conv_layer_config"])
    else:
        conv_layers = []
        i = 0
        while f"feature_extractor.conv_layers.{i}.0.weight" in sd:
            w = sd[f"feature_extractor.conv_layers.{i}.0.weight"]
            conv_layers.append((int(w.shape[0]), int(w.shape[2]), 5 if i == 0 else 2))
            i += 1
        conv_layers = tuple(conv_layers)
    # pos-conv geometry from the folded kernel [k, C/groups, C]; groups from
    # the in-channel width
    pos_w = sd.get("encoder.pos_conv.0.weight_v", sd.get("encoder.pos_conv.0.weight"))
    if pos_w is not None:
        conv_pos = int(pos_w.shape[2])
        conv_pos_groups = C // int(pos_w.shape[1])
    else:
        conv_pos, conv_pos_groups = 128, 16
    return Wav2Vec2Config(
        encoder_embed_dim=C,
        encoder_layers=max(n, 1),
        encoder_ffn_embed_dim=ffn,
        encoder_attention_heads=heads,
        layer_norm_first=lnf,
        extractor_mode=mode,
        conv_bias=conv_bias,
        conv_feature_layers=conv_layers,
        conv_pos=conv_pos,
        conv_pos_groups=conv_pos_groups,
        # the reference espnet expert calls wav2vec2.extract_features on the
        # raw wav — no input layer-norm even for large (expert.py:40-42)
        normalize=bool(conf.get("normalize", False)),
    )


def load_espnet_hubert_checkpoint(path: str, config: str = None):
    """Load an espnet2 torchaudio-HuBERT ckpt -> (Wav2Vec2Config, params).

    Accepts the raw espnet `.pth` (a state dict with
    `encoder.hubert_pretrain_model.` prefixes), a bare HuBERTPretrainModel
    state dict, or a bare torchaudio Wav2Vec2Model state dict. `config` is
    the espnet config.yaml (optional; shapes are inferred from weights)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model", ckpt) if isinstance(ckpt, dict) else ckpt
    for prefix in ("encoder.hubert_pretrain_model.", "hubert_pretrain_model."):
        if any(k.startswith(prefix) for k in sd):
            sd = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
            break
    if any(k.startswith("wav2vec2.") for k in sd):
        inner = {k[len("wav2vec2."):]: v for k, v in sd.items() if k.startswith("wav2vec2.")}
        inner.update({k: v for k, v in sd.items() if k.startswith("mask_generator.")})
        sd = inner

    conf = {}
    if config is not None:
        import yaml

        with open(config) as f:
            y = yaml.safe_load(f) or {}
        conf = dict(y.get("encoder_conf", {}))

    # extractor mode must be known before key renaming; sniff it from the
    # torchaudio names (per-layer layer_norm exists only in layer_norm mode)
    mode = "layer_norm" if any(
        k.startswith("feature_extractor.conv_layers.1.layer_norm.") for k in sd
    ) else "default"
    fsd = torchaudio_to_fairseq_keys(sd, mode)
    cfg = espnet_hubert_config_from_sd(fsd, conf)
    return cfg, trunk_params_from_torch(fsd, cfg)
