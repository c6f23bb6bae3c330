"""Component-attribution benchmark for the HuBERT-Large extraction path.

The axon tunnel has no working xprof device trace, so attribution is done by
benchmarking each pipeline stage in isolation with the on-device fori_loop +
host-fetch timing pattern (see bench.py for why host-side timing lies here).

Components (env COMP=comma list, default all):
  matmul   - sustained bf16 TFLOP/s at the encoder's exact GEMM shapes
  conv     - ConvFeatureExtractor alone on the bench batch
  posconv  - conv positional embedding alone
  encoder  - 24-layer transformer alone on pre-extracted features
  full     - the whole standardized path (same as bench.py)

Each prints one JSON line: {"component", "ms_per_iter", "tflops", "notes"}.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")

import jax

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = int(os.environ.get("BENCH_BATCH", 32))
SECS = float(os.environ.get("BENCH_SECS", 10.0))
ITERS = int(os.environ.get("BENCH_ITERS", 10))
T_WAV = int(16000 * SECS)
T_FEAT = (T_WAV - 400) // 320 + 1  # hubert conv stack stride 320, rf 400
C, FFN, L, H = 1024, 4096, 24, 16
DT = jnp.bfloat16


def timeit(fn, *args):
    """fn must return a scalar; on-device loop with data dependency.
    Best-of-REPS timed runs (tunnel jitter is several ms per fetch)."""
    out = fn(*args)
    float(np.asarray(out))  # compile + warmup
    best = float("inf")
    for _ in range(int(os.environ.get("REPS", 3))):
        t0 = time.perf_counter()
        float(np.asarray(fn(*args)))
        best = min(best, time.perf_counter() - t0)
    return best / ITERS


def report(component, ms, flops_per_iter, notes=""):
    print(
        json.dumps(
            {
                "component": component,
                "ms_per_iter": round(ms * 1e3, 2),
                "tflops": round(flops_per_iter / ms / 1e12, 1),
                "notes": notes,
            }
        ),
        flush=True,
    )


def bench_matmul():
    """The encoder's own GEMMs, chained: qkv, out, fc1, fc2 at [B*T, ...]."""
    M = B * T_FEAT
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(M, C).astype(np.float32), DT)
    w_qkv = jnp.asarray(rng.randn(C, 3 * C).astype(np.float32) * 0.02, DT)
    w_out = jnp.asarray(rng.randn(C, C).astype(np.float32) * 0.02, DT)
    w_fc1 = jnp.asarray(rng.randn(C, FFN).astype(np.float32) * 0.02, DT)
    w_fc2 = jnp.asarray(rng.randn(FFN, C).astype(np.float32) * 0.02, DT)

    @jax.jit
    def loop(x):
        def body(i, h):
            a = h @ w_qkv
            h = a[:, :C] + a[:, C : 2 * C] * 1e-3
            h = (h @ w_out) @ w_fc1 @ w_fc2
            return h * (1.0 / (1.0 + jnp.float32(i).astype(DT)))

        h = jax.lax.fori_loop(0, ITERS, body, x)
        return h[0, 0].astype(jnp.float32)

    ms = timeit(loop, x)
    flops = 2 * M * (C * 3 * C + C * C + C * FFN + FFN * C)
    report("matmul", ms, flops, f"M={M} chained qkv/out/fc1/fc2")


def bench_attn_kernel():
    """fused_qkv_attention alone at the bench shapes."""
    from s3prl_tpu.kernels.flash_attention import fused_qkv_attention

    rng = np.random.RandomState(0)
    qkv = jnp.asarray(rng.randn(B, T_FEAT, 3 * C).astype(np.float32) * 0.05, DT)
    kv_lens = jnp.full((B,), T_FEAT, jnp.int32)

    @jax.jit
    def loop(qkv):
        def body(i, carry):
            x, acc = carry
            o = fused_qkv_attention(x, kv_lens, H)
            dep = 0.0 * o[:, :1, :1].astype(x.dtype)
            return (x + jnp.pad(dep, ((0, 0), (0, x.shape[1] - 1), (0, x.shape[2] - 1))),
                    acc + o[0, 0, 0].astype(jnp.float32))

        _, acc = jax.lax.fori_loop(0, ITERS, body, (qkv, jnp.float32(0)))
        return acc

    ms = timeit(loop, qkv)
    flops = B * H * 2 * 2 * T_FEAT * T_FEAT * (C // H)
    report("attn_kernel", ms, flops, f"B={B} T={T_FEAT}")


def bench_conv(impl="conv"):
    from s3prl_tpu.models.convfe import ConvFeatureExtractor, DEFAULT_CONV_LAYERS

    layers = tuple((512, k, s) for (_, k, s) in DEFAULT_CONV_LAYERS)
    mod = ConvFeatureExtractor(layers, "layer_norm", False, DT, impl=impl,
                               quantize=os.environ.get("BENCH_QUANT", "0") == "1")
    rng = np.random.RandomState(0)
    wavs = jnp.asarray(rng.randn(B, T_WAV).astype(np.float32))
    params = jax.jit(mod.init)(jax.random.key(0), wavs)

    @jax.jit
    def loop(params, wavs):
        def body(i, carry):
            w, acc = carry
            f = mod.apply(params, w)
            dep = 0.0 * f[:, 0, :1].astype(w.dtype).mean(-1, keepdims=True)
            return (w + dep, acc + f[0, 0, 0].astype(jnp.float32))

        _, acc = jax.lax.fori_loop(0, ITERS, body, (wavs, jnp.float32(0)))
        return acc

    ms = timeit(loop, params, wavs)
    # MACs: per conv layer, out_T * C_in * C_out * k
    t = T_WAV
    cin = 1
    macs = 0
    for c, k, s in layers:
        t = (t - k) // s + 1
        macs += t * cin * c * k
        cin = c
    report(f"conv_{impl}", ms, 2 * macs * B, f"out_T={t}")


def bench_conv_prefix():
    """Cumulative-prefix timing of the REAL production conv chain: build the
    extractor truncated to the first k layers for k=1..7 and report diffs.
    Unlike bench_conv_layers (standalone per-layer modules whose chaining
    dep re-reads the full input every iteration), this measures each layer
    inside the exact production program, inter-layer effects included."""
    from s3prl_tpu.models.convfe import ConvFeatureExtractor, DEFAULT_CONV_LAYERS

    layers = tuple((512, k, s) for (_, k, s) in DEFAULT_CONV_LAYERS)
    rng = np.random.RandomState(0)
    wavs = jnp.asarray(rng.randn(B, T_WAV).astype(np.float32))
    prev_ms = 0.0
    t = T_WAV
    cin = 1
    for n in range(1, len(layers) + 1):
        mod = ConvFeatureExtractor(layers[:n], "layer_norm", False, DT,
                                   quantize=os.environ.get("BENCH_QUANT", "1") == "1")
        params = jax.jit(mod.init)(jax.random.key(0), wavs)

        @jax.jit
        def loop(params, wavs, mod=mod):
            def body(i, carry):
                w, acc = carry
                f = mod.apply(params, w)
                dep = 0.0 * f[:, 0, :1].astype(w.dtype).mean(-1, keepdims=True)
                return (w + dep, acc + f[0, 0, 0].astype(jnp.float32))

            _, acc = jax.lax.fori_loop(0, ITERS, body, (wavs, jnp.float32(0)))
            return acc

        sec = timeit(loop, params, wavs)
        c, k, s = layers[n - 1]
        t_out = (t - k) // s + 1
        macs = B * t_out * cin * c * k
        delta = sec - prev_ms
        report(f"conv_prefix{n}", sec, 0,
               f"delta_ms={delta * 1e3:.2f} layer{n - 1} k={k} "
               f"layer_tflops={2 * macs / max(delta, 1e-9) / 1e12:.1f}")
        prev_ms = sec
        t, cin = t_out, c


def bench_posconv():
    from s3prl_tpu.models.transformer import ConvPositionalEmbedding

    mod = ConvPositionalEmbedding(C, 128, 16, 1, DT)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, T_FEAT, C).astype(np.float32), DT)
    params = jax.jit(mod.init)(jax.random.key(0), x)

    @jax.jit
    def loop(params, x):
        def body(i, carry):
            h, acc = carry
            f = mod.apply(params, h)
            dep = 0.0 * f[:, :1, :1].astype(h.dtype).mean(-1, keepdims=True)
            return (h + dep, acc + f[0, 0, 0].astype(jnp.float32))

        _, acc = jax.lax.fori_loop(0, ITERS, body, (x, jnp.float32(0)))
        return acc

    ms = timeit(loop, params, x)
    macs = B * T_FEAT * 128 * (C // 16) * C  # grouped conv
    report("posconv", ms, 2 * macs, "k=128 g=16")


def bench_encoder(flash: bool):
    from s3prl_tpu.models.transformer import TransformerEncoder

    mod = TransformerEncoder(
        embed_dim=C, ffn_dim=FFN, num_layers=L, num_heads=H,
        layer_norm_first=True, dropout=0.0, attention_dropout=0.0,
        use_flash=flash, quantize=os.environ.get("BENCH_QUANT", "0") == "1",
        dtype=DT,
    )
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, T_FEAT, C).astype(np.float32), DT)
    params = jax.jit(mod.init)(jax.random.key(0), x)

    @jax.jit
    def loop(params, x):
        def body(i, carry):
            h, acc = carry
            _, hs = mod.apply(params, h)
            dep = 0.0 * hs[-1, :, :1, :1].astype(h.dtype).mean(-1, keepdims=True)
            return (h + dep, acc + hs[-1, 0, 0, 0].astype(jnp.float32))

        _, acc = jax.lax.fori_loop(0, ITERS, body, (x, jnp.float32(0)))
        return acc

    ms = timeit(loop, params, x)
    per_tok = 2 * (C * 3 * C + C * C + C * FFN + FFN * C)
    attn = 2 * 2 * T_FEAT * C  # scores + pv per token
    flops = B * T_FEAT * L * (per_tok + attn)
    report(f"encoder_{'flash' if flash else 'xla'}", ms, flops, f"T={T_FEAT}")


def bench_encoder_fused(flash: bool = True):
    """Encoder compute WITHOUT hidden-state materialization: the fused
    weighted-sum path collects no ys and does no [L+1] stack/concat.
    encoder_flash − encoder_fused ≈ the HBM cost of materializing the
    [25, B, T, C] hidden-state stack (scan ys writes + final concat)."""
    from s3prl_tpu.models.transformer import TransformerEncoder

    mod = TransformerEncoder(
        embed_dim=C, ffn_dim=FFN, num_layers=L, num_heads=H,
        layer_norm_first=True, dropout=0.0, attention_dropout=0.0,
        use_flash=flash, quantize=os.environ.get("BENCH_QUANT", "0") == "1",
        dtype=DT,
    )
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, T_FEAT, C).astype(np.float32), DT)
    w = jax.nn.softmax(jnp.zeros((L + 1,), jnp.float32))
    params = jax.jit(mod.init)(jax.random.key(0), x)

    @jax.jit
    def loop(params, x):
        def body(i, carry):
            h, acc = carry
            _, hs = mod.apply(params, h, layer_weights=w)
            dep = 0.0 * hs[-1, :, :1, :1].astype(h.dtype).mean(-1, keepdims=True)
            return (h + dep, acc + hs[-1, 0, 0, 0].astype(jnp.float32))

        _, acc = jax.lax.fori_loop(0, ITERS, body, (x, jnp.float32(0)))
        return acc

    ms = timeit(loop, params, x)
    per_tok = 2 * (C * 3 * C + C * C + C * FFN + FFN * C)
    attn = 2 * 2 * T_FEAT * C
    flops = B * T_FEAT * L * (per_tok + attn)
    report("encoder_fused", ms, flops, f"T={T_FEAT} no-hs-stack")


def bench_trunk():
    """The real full path WITHOUT standardize_hidden_states: full − trunk
    isolates the match-length repeat-frame copy over [25, B, T, C]."""
    from s3prl_tpu import hub

    up = hub.load("hubert_large_ll60k", dtype=DT,
                  flash=os.environ.get("BENCH_FLASH", "1") == "1",
                  quantize=os.environ.get("BENCH_QUANT", "0") == "1")
    rng = np.random.RandomState(0)
    wavs = jnp.asarray(rng.randn(B, T_WAV).astype(np.float32))
    lens = jnp.full((B,), T_WAV, jnp.int32)

    @jax.jit
    def loop(params, wavs, lens):
        def body(i, carry):
            w, acc = carry
            hs, _ = up.apply_fn(params, w, lens, False, None)
            dep = 0.0 * hs[-1, :, 0, :1].astype(w.dtype).mean(-1, keepdims=True)
            return (w + dep, acc + hs[-1, 0, 0, 0].astype(jnp.float32))

        _, acc = jax.lax.fori_loop(0, ITERS, body, (wavs, jnp.float32(0)))
        return acc

    ms = timeit(loop, up.params, wavs, lens)
    report("trunk_nostd", ms, 0, f"audio-sec/s={B * SECS / ms:.0f}")


def bench_glue():
    """Isolated glue ops of the trunk that no other component covers:
    normalize_wavs, post-conv fp32 LN + 512->1024 proj, and the
    standardize repeat-frame copy over the [25, B, T, C] stack."""
    import flax.linen as nn

    from s3prl_tpu.models.wav2vec2 import normalize_wavs
    from s3prl_tpu.upstream.base import standardize_hidden_states

    rng = np.random.RandomState(0)
    wavs = jnp.asarray(rng.randn(B, T_WAV).astype(np.float32))
    lens = jnp.full((B,), T_WAV, jnp.int32)

    @jax.jit
    def norm_loop(wavs):
        def body(i, carry):
            w, acc = carry
            o = normalize_wavs(w, lens)
            return w + 0.0 * o[:, :1], acc + o[0, 0]

        _, acc = jax.lax.fori_loop(0, ITERS, body, (wavs, jnp.float32(0)))
        return acc

    ms = timeit(norm_loop, wavs)
    report("glue_normalize_wavs", ms, 0, f"[{B},{T_WAV}] fp32")

    feats = jnp.asarray(rng.randn(B, T_FEAT, 512).astype(np.float32), DT)

    class Proj(nn.Module):
        @nn.compact
        def __call__(self, x):
            y = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32)(x)
            return nn.Dense(C, dtype=DT)(y.astype(DT))

    mod = Proj()
    params = jax.jit(mod.init)(jax.random.key(0), feats)

    @jax.jit
    def proj_loop(params, x):
        def body(i, carry):
            h, acc = carry
            o = mod.apply(params, h)
            dep = 0.0 * o[:, :1, :1].astype(h.dtype)
            return (h + jnp.pad(dep, ((0, 0), (0, h.shape[1] - 1), (0, h.shape[2] - 1))),
                    acc + o[0, 0, 0].astype(jnp.float32))

        _, acc = jax.lax.fori_loop(0, ITERS, body, (feats, jnp.float32(0)))
        return acc

    ms = timeit(proj_loop, params, feats)
    report("glue_ln_proj", ms, 2 * B * T_FEAT * 512 * C, "fp32 LN + 512->1024")

    hs = jnp.asarray(rng.randn(L + 1, B, T_FEAT, C).astype(np.float32) * 0.1, DT)

    @jax.jit
    def std_loop(hs):
        def body(i, carry):
            h, acc = carry
            o, _ = standardize_hidden_states(h, lens, T_WAV, 320)
            dep = 0.0 * o[-1:, :, :1, :1].astype(h.dtype)
            return (h + jnp.pad(dep, ((0, h.shape[0] - 1), (0, 0), (0, h.shape[2] - 1), (0, h.shape[3] - 1))),
                    acc + o[0, 0, 0, 0].astype(jnp.float32))

        _, acc = jax.lax.fori_loop(0, ITERS, body, (hs, jnp.float32(0)))
        return acc

    ms = timeit(std_loop, hs)
    gb = (L + 1) * B * T_FEAT * C * 2 * 2 / 1e9  # read + write, bf16
    report("glue_standardize", ms, 0, f"{gb:.2f} GB/iter repeat-frame copy")


def bench_full():
    from s3prl_tpu import hub

    up = hub.load("hubert_large_ll60k", dtype=DT,
                  flash=os.environ.get("BENCH_FLASH", "1") == "1",
                  quantize=os.environ.get("BENCH_QUANT", "0") == "1")
    rng = np.random.RandomState(0)
    wavs = jnp.asarray(rng.randn(B, T_WAV).astype(np.float32))
    lens = jnp.full((B,), T_WAV, jnp.int32)

    @jax.jit
    def loop(params, wavs, lens):
        def body(i, carry):
            w, acc = carry
            hs, _ = up.apply_standardized(params, w, lens)
            dep = 0.0 * hs[-1, :, 0, :1].astype(w.dtype).mean(-1, keepdims=True)
            return (w + dep, acc + hs[-1, 0, 0, 0].astype(jnp.float32))

        _, acc = jax.lax.fori_loop(0, ITERS, body, (wavs, jnp.float32(0)))
        return acc

    ms = timeit(loop, up.params, wavs, lens)
    per_tok = 2 * (C * 3 * C + C * C + C * FFN + FFN * C)
    attn = 2 * 2 * T_FEAT * C
    flops = B * T_FEAT * L * (per_tok + attn)  # encoder only, for MFU ref
    report("full", ms, flops, f"audio-sec/s={B * SECS / ms:.0f}")


def bench_attn_official():
    """jax's tuned pallas flash_attention (incl. the qkv->BHTD transposes)."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        SegmentIds, flash_attention,
    )

    rng = np.random.RandomState(0)
    qkv = jnp.asarray(rng.randn(B, T_FEAT, 3 * C).astype(np.float32) * 0.05, DT)
    kv_lens = jnp.full((B,), T_FEAT, jnp.int32)
    Dh = C // H

    @jax.jit
    def loop(qkv):
        Tp = -(-T_FEAT // 128) * 128
        seg_q = jnp.ones((B, Tp), jnp.int32)
        seg_kv = (jnp.arange(Tp)[None] < kv_lens[:, None]).astype(jnp.int32)

        def attn(x):
            xp = jnp.pad(x, ((0, 0), (0, Tp - T_FEAT), (0, 0)))
            q, k, v = jnp.split(xp, 3, axis=-1)
            q = q.reshape(B, Tp, H, Dh).transpose(0, 2, 1, 3)
            k = k.reshape(B, Tp, H, Dh).transpose(0, 2, 1, 3)
            v = v.reshape(B, Tp, H, Dh).transpose(0, 2, 1, 3)
            o = flash_attention(
                q, k, v, segment_ids=SegmentIds(seg_q, seg_kv),
                sm_scale=Dh ** -0.5,
            )
            return o.transpose(0, 2, 1, 3).reshape(B, Tp, C)[:, :T_FEAT]

        def body(i, carry):
            x, acc = carry
            o = attn(x)
            dep = 0.0 * o[:, :1, :1].astype(x.dtype)
            return (x + jnp.pad(dep, ((0, 0), (0, x.shape[1] - 1), (0, x.shape[2] - 1))),
                    acc + o[0, 0, 0].astype(jnp.float32))

        _, acc = jax.lax.fori_loop(0, ITERS, body, (qkv, jnp.float32(0)))
        return acc

    ms = timeit(loop, qkv)
    flops = B * H * 2 * 2 * T_FEAT * T_FEAT * (C // H)
    report("attn_official", ms, flops, f"B={B} T={T_FEAT}")


def bench_conv_layers():
    """Each conv layer (+ its LN+GELU) timed separately, at bench batch."""
    import flax.linen as nn

    from s3prl_tpu.models.convfe import DEFAULT_CONV_LAYERS, _Im2ColConv

    rng = np.random.RandomState(0)
    t = T_WAV
    cin = 1
    x_np = np.random.default_rng(0).standard_normal((B, t, 1), dtype=np.float32)
    for i, (cout, k, stride) in enumerate(DEFAULT_CONV_LAYERS):
        cout = 512

        class Layer(nn.Module):
            @nn.compact
            def __call__(self, x):
                if i == 0:
                    y = _Im2ColConv(cout, k, stride, False, DT, name="conv")(x)
                else:
                    y = nn.Conv(cout, (k,), strides=(stride,), padding="VALID",
                                use_bias=False, dtype=DT, name="conv")(x)
                y = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln")(y).astype(DT)
                return nn.gelu(y, approximate=False)

        mod = Layer()
        x = jnp.asarray(x_np, DT)
        params = jax.jit(mod.init)(jax.random.key(0), x)

        @jax.jit
        def loop(params, x):
            def body(_, carry):
                h, acc = carry
                f = mod.apply(params, h)
                dep = 0.0 * f[:, :1, :1].astype(h.dtype)
                return (h + jnp.pad(dep, ((0, 0), (0, h.shape[1] - 1), (0, h.shape[2] - 1))),
                        acc + f[0, 0, 0].astype(jnp.float32))

            _, acc = jax.lax.fori_loop(0, ITERS, body, (x, jnp.float32(0)))
            return acc

        ms = timeit(loop, params, x)
        t_out = (t - k) // stride + 1
        macs = B * t_out * cin * cout * k
        report(f"conv_layer{i}", ms, 2 * macs, f"T={t}->{t_out} cin={cin} k={k}")
        t, cin = t_out, cout
        x_np = np.random.default_rng(i).standard_normal((B, t, cin), dtype=np.float32) * 0.1


if __name__ == "__main__":
    comps = os.environ.get("COMP", "matmul,conv,posconv,encoder,full").split(",")
    for c in comps:
        c = c.strip()
        try:
            if c == "matmul":
                bench_matmul()
            elif c == "conv":
                bench_conv("conv")
            elif c == "conv_im2col":
                bench_conv("im2col")
            elif c == "attn":
                bench_attn_kernel()
            elif c == "attn_official":
                bench_attn_official()
            elif c == "conv_layers":
                bench_conv_layers()
            elif c == "conv_prefix":
                bench_conv_prefix()
            elif c == "posconv":
                bench_posconv()
            elif c == "encoder":
                bench_encoder(flash=True)
            elif c == "encoder_xla":
                bench_encoder(flash=False)
            elif c == "encoder_fused":
                bench_encoder_fused()
            elif c == "trunk":
                bench_trunk()
            elif c == "glue":
                bench_glue()
            elif c == "full":
                bench_full()
        except Exception as e:  # keep going; one component failing is itself data
            print(json.dumps({"component": c, "error": repr(e)}), flush=True)
