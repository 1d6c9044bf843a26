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
