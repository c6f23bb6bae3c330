"""TPU-native k-means for acoustic-unit discovery (HuBERT pretraining).

The reference ecosystem produces HuBERT's masked-prediction targets with
fairseq's offline CPU pipeline (dump MFCC -> sklearn MiniBatchKMeans ->
dump labels). Here both phases are single jitted device programs built
around the MXU: the E-step's pairwise distances are ONE GEMM
(||x-c||^2 = ||x||^2 - 2 x @ C^T + ||c||^2, with the x^2 term dropped as
assignment-invariant), and the M-step accumulates cluster sums with a
one-hot matmul — no scatter, no data-dependent shapes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _assign(feats: jnp.ndarray, centroids: jnp.ndarray) -> jnp.ndarray:
    """[N, D] x [K, D] -> [N] nearest-centroid indices (one GEMM)."""
    scores = feats @ centroids.T - 0.5 * jnp.sum(centroids ** 2, axis=1)
    return jnp.argmax(scores, axis=1).astype(jnp.int32)


@partial(jax.jit, static_argnames=("num_clusters", "iters"))
def kmeans_fit(key, feats, num_clusters: int, iters: int = 20):
    """Lloyd's k-means: feats [N, D] f32 -> centroids [K, D].

    Init = a random sample of distinct rows; empty clusters keep their
    previous centroid. Everything is fixed-shape matmuls under one jit
    (lax.fori_loop), so the whole fit is a single device program.
    """
    n = feats.shape[0]
    idx = jax.random.permutation(key, n)[:num_clusters]
    init = feats[idx]

    def body(_, centroids):
        assign = _assign(feats, centroids)
        onehot = jax.nn.one_hot(assign, num_clusters, dtype=feats.dtype)  # [N, K]
        sums = onehot.T @ feats  # [K, D] — M-step as one GEMM
        counts = jnp.sum(onehot, axis=0)[:, None]  # [K, 1]
        return jnp.where(counts > 0, sums / jnp.maximum(counts, 1), centroids)

    return jax.lax.fori_loop(0, iters, body, init)


@jax.jit
def kmeans_assign(feats, centroids) -> jnp.ndarray:
    """[N, D] -> [N] int32 unit labels for fitted centroids."""
    return _assign(feats, centroids)


def kmeans_inertia(feats, centroids) -> float:
    """Mean squared distance to the assigned centroid (fit diagnostics)."""
    assign = _assign(feats, centroids)
    diff = feats - centroids[assign]
    return float(jnp.mean(jnp.sum(diff ** 2, axis=1)))
