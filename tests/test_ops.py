"""Arithmetic / dot / stats oracle tests (reference tests/test_ops.py).

Each test seeds its OWN RandomState so shapes/ranks are identical across
runs and xdist workers — the persistent XLA compile cache then hits on
every re-run (module-level np.random state would depend on which tests a
worker happened to execute first).
"""

import numpy as np

import tntorch_tpu as tn
from util import random_format


def check(t1, t2):
    x1 = t1.numpy()
    x2 = t2.numpy()
    assert tn.relative_error(t1 + t2, x1 + x2) <= 1e-7
    assert tn.relative_error(t1 - t2, x1 - x2) <= 1e-7
    assert tn.relative_error(t1 * t2, x1 * x2) <= 1e-7
    assert tn.relative_error(-t1 + t2, -x1 + x2) <= 1e-7


def test_ops():
    rng = np.random.RandomState(10)
    for i in range(6):
        t1 = tn.rand(
            rng.randint(1, 8, rng.randint(1, 6)), ranks_tt=3, ranks_tucker=2
        )
        t2 = tn.rand(t1.shape)
        check(t1, t2)

    shape = [8] * 4
    t1 = tn.rand(shape, ranks_tt=[3, None, None], ranks_cp=[None, None, 2, 2], ranks_tucker=5)
    t2 = tn.rand(shape, ranks_tt=[None, 2, None], ranks_cp=[4, None, None, 3])
    check(t1, t2)

    t2 = t1 * 2
    check(t1, t2)

    for i in range(8):
        t1 = random_format(shape, rng=rng)
        t2 = random_format(shape, rng=rng)
        check(t1, t2)


def test_broadcast():
    rng = np.random.RandomState(11)
    for i in range(5):
        shape1 = rng.randint(1, 10, 4)
        shape2 = shape1.copy()
        shape2[rng.choice(len(shape1), rng.randint(0, len(shape1) + 1))] = 1
        t1 = random_format(shape1, rng=rng)
        t2 = random_format(shape2, rng=rng)
        check(t1, t2)


def test_dot():
    rng = np.random.RandomState(12)

    def check_dot(t1, t2):
        x1 = t1.numpy()
        x2 = t2.numpy()
        gt = np.dot(x1.flatten(), x2.flatten())
        assert tn.relative_error(tn.dot(t1, t2), gt) <= 1e-7

    t1 = tn.rand(rng.randint(1, 8, rng.randint(1, 6)), ranks_tt=2)
    check_dot(t1, tn.rand(t1.shape, ranks_tt=3))

    t1 = tn.rand(rng.randint(1, 8, rng.randint(1, 6)), ranks_tt=2, ranks_tucker=4)
    check_dot(t1, tn.rand(t1.shape, ranks_tt=3))

    t1 = tn.rand(rng.randint(1, 8, rng.randint(1, 6)), ranks_tt=2)
    check_dot(t1, tn.rand(t1.shape, ranks_tt=3, ranks_tucker=4))

    t1 = tn.rand(rng.randint(1, 8, rng.randint(1, 6)), ranks_tt=2, ranks_tucker=3)
    check_dot(t1, tn.rand(t1.shape, ranks_tt=3, ranks_tucker=4))

    t1 = tn.rand([32] * 4, ranks_tt=[3, None, None], ranks_cp=[None, None, 10, 10], ranks_tucker=5)
    t2 = tn.rand([32] * 4, ranks_tt=[None, 2, None], ranks_cp=[4, None, None, 5])
    check_dot(t1, t2)

    shape = [8] * 4
    for i in range(8):
        check_dot(random_format(shape, rng=rng), random_format(shape, rng=rng))


def test_dot_partial():
    t1 = tn.rand([5, 6], ranks_tt=2)
    t2 = tn.rand([5, 6, 3, 4], ranks_tt=3)
    r = tn.dot(t1, t2)
    gt = np.einsum("ab,abcd->cd", t1.numpy(), t2.numpy())
    assert np.linalg.norm(r.numpy() - gt) / np.linalg.norm(gt) <= 1e-7


def test_stats():
    rng = np.random.RandomState(13)
    shape = [8] * 4
    for i in range(8):
        t = random_format(shape, rng=rng)
        x = t.numpy()
        assert tn.relative_error(tn.mean(t), np.mean(x)) <= 1e-3
        assert tn.relative_error(tn.var(t), np.var(x)) <= 1e-3
        assert tn.relative_error(tn.norm(t), np.linalg.norm(x)) <= 1e-3
