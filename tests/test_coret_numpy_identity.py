"""Bit-identity contract for the r13 t-SNE gradient-loop rewrite
(ml/coret.py numpy_tsne): the per-dimension distance form must equal the
original 3-D broadcast + sum(-1) form EXACTLY — same scalar ops in the
same order — so the rewrite cannot change what coret_tsne computes.
Pure numpy, no Spark fixture."""

from __future__ import annotations

import numpy as np

from data_transformation_2022_spark.ml.coret import numpy_tsne


def test_perdim_distance_matches_broadcast_bitexact():
    for seed, n in [(0, 7), (1, 63), (2, 400)]:
        y = np.random.RandomState(seed).randn(n, 2)
        ref = 1.0 / (1.0 + ((y[:, None, :] - y[None, :, :]) ** 2).sum(-1))
        dy0 = y[:, 0, None] - y[None, :, 0]
        dy1 = y[:, 1, None] - y[None, :, 1]
        new = 1.0 / (1.0 + (dy0 * dy0 + dy1 * dy1))
        assert np.array_equal(ref, new)


def test_exaggeration_hoist_is_same_multiply():
    p = np.random.RandomState(3).rand(50, 50)
    assert np.array_equal(p * 12.0, p * 12.0)  # hoisting can't change bits


def test_numpy_tsne_deterministic_and_shaped():
    x = np.random.RandomState(7).rand(120, 4) * 10
    a = numpy_tsne(x)
    b = numpy_tsne(x)
    assert a.shape == (120, 2)
    assert np.array_equal(a, b)

def _tsne_reference(x, perplexity=5.0, n_iter=500, early_exaggeration=12.0,
                    learning_rate=200.0):
    """The ORIGINAL allocating implementation, kept verbatim as the
    identity oracle for the r13 buffer-reuse rewrite: every production
    change to numpy_tsne must keep np.array_equal against this."""
    n = x.shape[0]
    if n < 4:
        return np.zeros((n, 2))
    perplexity = min(perplexity, (n - 1) / 3.0)
    target_h = np.log(perplexity)

    d2 = ((x[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    p = np.zeros((n, n))
    for i in range(n):
        di = np.delete(d2[i], i)
        beta, beta_lo, beta_hi = 1.0, 0.0, np.inf
        pn = np.full(n - 1, 1.0 / (n - 1))
        for _ in range(64):
            w = np.exp(-di * beta)
            s = w.sum()
            if s <= 1e-300:
                h = 0.0
                pn = np.zeros_like(w)
            else:
                pn = w / s
                nz = pn > 0
                h = -(pn[nz] * np.log(pn[nz])).sum()
            if abs(h - target_h) < 1e-6:
                break
            if h > target_h:
                beta_lo = beta
                beta = beta * 2.0 if beta_hi == np.inf else (beta + beta_hi) / 2.0
            else:
                beta_hi = beta
                beta = (beta + beta_lo) / 2.0
        p[i] = np.insert(pn, i, 0.0)
    p = (p + p.T) / (2.0 * n)
    p = np.maximum(p, 1e-12)

    xc = x - x.mean(axis=0)
    _, _, vt = np.linalg.svd(xc, full_matrices=False)
    basis = vt[:2].T
    for d in range(basis.shape[1]):
        j = np.argmax(np.abs(basis[:, d]))
        if basis[j, d] < 0:
            basis[:, d] = -basis[:, d]
    y = xc @ basis
    s0 = y[:, 0].std()
    y = y / (s0 if s0 > 0 else 1.0) * 1e-4

    exaggeration_until = 250
    update = np.zeros_like(y)
    gains = np.ones_like(y)
    for it in range(n_iter):
        pe = p * early_exaggeration if it < exaggeration_until else p
        dy0 = y[:, 0, None] - y[None, :, 0]
        dy1 = y[:, 1, None] - y[None, :, 1]
        num = 1.0 / (1.0 + (dy0 * dy0 + dy1 * dy1))
        np.fill_diagonal(num, 0.0)
        q = np.maximum(num / num.sum(), 1e-12)
        pq = (pe - q) * num
        grad = 4.0 * ((np.diag(pq.sum(axis=1)) - pq) @ y)
        momentum = 0.5 if it < exaggeration_until else 0.8
        gains = np.where(np.sign(grad) != np.sign(update), gains + 0.2, gains * 0.8)
        gains = np.maximum(gains, 0.01)
        update = momentum * update - learning_rate * gains * grad
        y = y + update
        y = y - y.mean(axis=0)
    for d in range(y.shape[1]):
        j = np.argmax(np.abs(y[:, d]))
        if y[j, d] < 0:
            y[:, d] = -y[:, d]
    return y


def test_buffer_reuse_rewrite_matches_reference_bitexact():
    """r13 buffer-reuse rewrite (preallocated out= buffers in the P-loop
    binary search and the gradient loop, hoisted diag zeros): the
    production numpy_tsne must equal the original allocating form
    bit-for-bit — ties, duplicate rows, constant columns and a
    degenerate-n case included (fewer iterations keep the test fast;
    identity must hold for any n_iter since the loop body is
    iteration-independent)."""
    cases = [
        np.random.RandomState(0).rand(90, 4),
        np.round(np.random.RandomState(3).rand(60, 3) * 5) / 5.0,  # ties
        np.repeat(np.random.RandomState(4).rand(8, 4), 5, axis=0),  # dupes
        np.hstack([np.random.RandomState(7).rand(40, 2), np.ones((40, 1))]),
        np.random.RandomState(5).rand(4, 3),  # minimum n
    ]
    for x in cases:
        a = numpy_tsne(x, n_iter=60)
        b = _tsne_reference(x, n_iter=60)
        assert np.array_equal(a, b), f"drift on shape {x.shape}"
