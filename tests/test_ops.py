"""Arithmetic / dot / stats oracle tests (reference tests/test_ops.py)."""

import numpy as np

import tntorch_tpu as tn
from util import random_format

np.random.seed(1)


def check(t1, t2):
    x1 = t1.numpy()
    x2 = t2.numpy()
    assert tn.relative_error(t1 + t2, x1 + x2) <= 1e-7
    assert tn.relative_error(t1 - t2, x1 - x2) <= 1e-7
    assert tn.relative_error(t1 * t2, x1 * x2) <= 1e-7
    assert tn.relative_error(-t1 + t2, -x1 + x2) <= 1e-7


def test_ops():
    for i in range(10):
        t1 = tn.rand(
            np.random.randint(1, 8, np.random.randint(1, 6)), ranks_tt=3, ranks_tucker=2
        )
        t2 = tn.rand(t1.shape)
        check(t1, t2)

    shape = [8] * 4
    t1 = tn.rand(shape, ranks_tt=[3, None, None], ranks_cp=[None, None, 2, 2], ranks_tucker=5)
    t2 = tn.rand(shape, ranks_tt=[None, 2, None], ranks_cp=[4, None, None, 3])
    check(t1, t2)

    t2 = t1 * 2
    check(t1, t2)

    for i in range(12):
        t1 = random_format(shape)
        t2 = random_format(shape)
        check(t1, t2)


def test_broadcast():
    for i in range(6):
        shape1 = np.random.randint(1, 10, 4)
        shape2 = shape1.copy()
        shape2[np.random.choice(len(shape1), np.random.randint(0, len(shape1) + 1))] = 1
        t1 = random_format(shape1)
        t2 = random_format(shape2)
        check(t1, t2)


def test_dot():
    def check_dot(t1, t2):
        x1 = t1.numpy()
        x2 = t2.numpy()
        gt = np.dot(x1.flatten(), x2.flatten())
        assert tn.relative_error(tn.dot(t1, t2), gt) <= 1e-7

    t1 = tn.rand(np.random.randint(1, 8, np.random.randint(1, 6)), ranks_tt=2)
    check_dot(t1, tn.rand(t1.shape, ranks_tt=3))

    t1 = tn.rand(np.random.randint(1, 8, np.random.randint(1, 6)), ranks_tt=2, ranks_tucker=4)
    check_dot(t1, tn.rand(t1.shape, ranks_tt=3))

    t1 = tn.rand(np.random.randint(1, 8, np.random.randint(1, 6)), ranks_tt=2)
    check_dot(t1, tn.rand(t1.shape, ranks_tt=3, ranks_tucker=4))

    t1 = tn.rand(np.random.randint(1, 8, np.random.randint(1, 6)), ranks_tt=2, ranks_tucker=3)
    check_dot(t1, tn.rand(t1.shape, ranks_tt=3, ranks_tucker=4))

    t1 = tn.rand([32] * 4, ranks_tt=[3, None, None], ranks_cp=[None, None, 10, 10], ranks_tucker=5)
    t2 = tn.rand([32] * 4, ranks_tt=[None, 2, None], ranks_cp=[4, None, None, 5])
    check_dot(t1, t2)

    shape = [8] * 4
    for i in range(12):
        check_dot(random_format(shape), random_format(shape))


def test_dot_partial():
    t1 = tn.rand([5, 6], ranks_tt=2)
    t2 = tn.rand([5, 6, 3, 4], ranks_tt=3)
    r = tn.dot(t1, t2)
    gt = np.einsum("ab,abcd->cd", t1.numpy(), t2.numpy())
    assert np.linalg.norm(r.numpy() - gt) / np.linalg.norm(gt) <= 1e-7


def test_stats():
    shape = [8] * 4
    for i in range(12):
        t = random_format(shape)
        x = t.numpy()
        assert tn.relative_error(tn.mean(t), np.mean(x)) <= 1e-3
        assert tn.relative_error(tn.var(t), np.var(x)) <= 1e-3
        assert tn.relative_error(tn.norm(t), np.linalg.norm(x)) <= 1e-3
