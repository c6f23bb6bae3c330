"""Dynamic time warping for query-by-example spoken term detection.

Behavioral spec from the reference's QbE recipes (s3prl/downstream/
quesst14_dtw — dtw-python with configurable distance and subsequence mode):
a query is slid over a document; the score is the negative normalized
minimal-cost subsequence alignment.

TPU rendering: the DP recursion runs as a lax.scan over query rows with a
row-wise prefix recursion — all queries/documents padded to static shapes
and batched with vmap (replaces the reference's per-pair CPU C-core calls).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

INF = 1e9


def cosine_distance_matrix(query: jnp.ndarray, doc: jnp.ndarray) -> jnp.ndarray:
    """[Tq, D], [Td, D] -> [Tq, Td] in [0, 2]."""
    q = query / jnp.maximum(jnp.linalg.norm(query, axis=-1, keepdims=True), 1e-8)
    d = doc / jnp.maximum(jnp.linalg.norm(doc, axis=-1, keepdims=True), 1e-8)
    return 1.0 - q @ d.T


def _row_update(prev_row: jnp.ndarray, cost_row: jnp.ndarray) -> jnp.ndarray:
    """One DP row: cur[j] = cost[j] + min(prev[j], prev[j-1], cur[j-1]).

    The cur[j-1] dependency is a min-plus prefix scan: with
    base[j] = cost[j] + min(prev[j], prev[j-1]), cur[j] =
    min_{k<=j} (base[k] + sum_{i=k+1..j} cost[i]) — computed by an
    associative scan over (value, cost) pairs.
    """
    prev_shift = jnp.concatenate([jnp.full((1,), INF), prev_row[:-1]])
    base = cost_row + jnp.minimum(prev_row, prev_shift)

    def combine(a, b):
        # a, b: (best, cost_sum); appending segment b after a
        best = jnp.minimum(b[0], a[0] + b[1])
        return best, a[1] + b[1]

    best, _ = jax.lax.associative_scan(combine, (base, cost_row))
    return best


def subsequence_dtw_cost(cost: jnp.ndarray, query_len, doc_len) -> jnp.ndarray:
    """Minimal average-cost subsequence alignment of query into doc.

    cost: [Tq, Td] padded distance matrix. Start anywhere in the doc row 0,
    end anywhere in the last valid query row; normalized by query length.
    """
    Tq, Td = cost.shape
    doc_mask = jnp.arange(Td) < doc_len
    cost = jnp.where(doc_mask[None, :], cost, INF)

    first = cost[0]

    def step(prev_row, cost_row):
        cur = _row_update(prev_row, cost_row)
        return cur, cur

    _, rows = jax.lax.scan(step, first, cost[1:])
    rows = jnp.concatenate([first[None], rows], axis=0)  # [Tq, Td]
    q_idx = jnp.clip(query_len - 1, 0, Tq - 1)
    last_row = rows[q_idx]
    return jnp.min(jnp.where(doc_mask, last_row, INF)) / jnp.maximum(query_len, 1)


@partial(jax.jit, static_argnames=())
def qbe_scores(
    queries: jnp.ndarray,  # [Q, Tq, D] padded
    query_lens: jnp.ndarray,  # [Q]
    docs: jnp.ndarray,  # [N, Td, D] padded
    doc_lens: jnp.ndarray,  # [N]
) -> jnp.ndarray:
    """[Q, N] similarity scores (higher = better match)."""

    def one_pair(q, ql, d, dl):
        cost = cosine_distance_matrix(q, d)
        return -subsequence_dtw_cost(cost, ql, dl)

    per_query = jax.vmap(
        lambda q, ql: jax.vmap(lambda d, dl: one_pair(q, ql, d, dl))(docs, doc_lens)
    )
    return per_query(queries, query_lens)
