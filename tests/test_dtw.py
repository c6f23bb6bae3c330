"""QbE DTW tests: the associative-scan DP must equal a reference numpy DP."""

import numpy as np

import jax.numpy as jnp

from s3prl_tpu.ops.dtw import cosine_distance_matrix, qbe_scores, subsequence_dtw_cost


def numpy_subsequence_dtw(cost, ql, dl):
    cost = cost[:ql, :dl]
    Tq, Td = cost.shape
    D = np.full((Tq, Td), np.inf)
    D[0] = cost[0]
    for i in range(1, Tq):
        for j in range(Td):
            best = D[i - 1, j]
            if j > 0:
                best = min(best, D[i - 1, j - 1], D[i, j - 1])
            D[i, j] = cost[i, j] + best
    return D[-1].min() / ql


def test_dtw_matches_numpy():
    rng = np.random.RandomState(0)
    for ql, dl in [(5, 12), (8, 8), (3, 20)]:
        q = rng.randn(10, 4).astype(np.float32)
        d = rng.randn(24, 4).astype(np.float32)
        cost = np.asarray(cosine_distance_matrix(jnp.asarray(q), jnp.asarray(d)))
        want = numpy_subsequence_dtw(cost, ql, dl)
        got = float(subsequence_dtw_cost(jnp.asarray(cost[:10]), ql, dl))
        np.testing.assert_allclose(got, want, rtol=1e-5)


def test_qbe_scores_find_embedded_query():
    """A query embedded verbatim inside a doc must outscore random docs."""
    rng = np.random.RandomState(1)
    query = rng.randn(6, 8).astype(np.float32)
    doc_match = rng.randn(30, 8).astype(np.float32)
    doc_match[10:16] = query
    doc_other = rng.randn(30, 8).astype(np.float32)
    scores = np.asarray(
        qbe_scores(
            jnp.asarray(query[None]),
            jnp.asarray([6]),
            jnp.asarray(np.stack([doc_match, doc_other])),
            jnp.asarray([30, 30]),
        )
    )
    assert scores[0, 0] > scores[0, 1]
