"""Indexing catalog tests (reference tests/test_indexing.py)."""

import numpy as np
from pytest import raises

import tntorch_tpu as tn
from util import random_format



def check(x, t, idx):
    xidx = x[idx]
    tidx = t[idx]
    if isinstance(tidx, tn.Tensor):
        tidx = tidx.numpy()
    else:
        tidx = np.asarray(tidx)
    assert np.array_equal(np.shape(xidx), np.shape(tidx))
    nrm = np.linalg.norm(xidx)
    assert np.linalg.norm(xidx - tidx) <= 1e-7 * max(1, nrm)


def test_squeeze():
    rng = np.random.RandomState(31)
    for i in range(8):
        x = rng.randint(1, 3, rng.randint(2, 10))
        t = tn.Tensor(rng.rand(*x))
        sq = tn.squeeze(t)
        assert np.array_equal(np.squeeze(t.numpy()).shape, sq.shape if isinstance(sq, tn.Tensor) else np.shape(np.asarray(sq)))


def test_slicing():
    t = tn.rand([1, 3, 1, 2, 1], ranks_tt=3, ranks_tucker=2)
    x = t.numpy()
    check(x, t, slice(None))
    check(x, t, (slice(None), slice(1, None)))
    check(x, t, (slice(None), slice(0, 2, None), slice(0, 1)))


IDX_CATALOG = [
    ([0, 0, 0], None, None, 3),
    ([0, 0, 0, 0, 0], slice(None), None, 0),
    (0, [0]),
    ([0], [0]),
    ([0], None, None, None, 0, 1),
    (slice(None), [0, 1, 2, 3, 4, 5], [0, 1, 2, 3, 4, 5]),
    ([0, 1, 2, 3, 4, 5], [0, 1, 2, 3, 4, 5]),
    (slice(None), slice(None), slice(None), 0),
    (slice(None), slice(None), [0, 1], 0),
    (0, np.array([0]), None, 0),
    (slice(None), slice(None), slice(None), slice(None), None),
    (None, slice(None), slice(None), slice(None), slice(None), None),
    (None, slice(None), slice(None), slice(None), slice(None)),
]


def check_one_tensor(t, catalog=IDX_CATALOG):
    x = t.numpy()
    for idx in catalog:
        check(x, t, idx)


def test_mixed():
    check_one_tensor(tn.rand([6, 7, 8, 9], ranks_tt=3, ranks_tucker=2))
    check_one_tensor(tn.rand([6, 7, 8, 9], ranks_tt=None, ranks_tucker=2, ranks_cp=3))
    check_one_tensor(
        tn.rand([6, 7, 8, 9], ranks_tt=[4, None, None], ranks_tucker=2, ranks_cp=[None, None, 3, 3])
    )
    check_one_tensor(
        tn.rand(
            [6, 7, 8, 9],
            ranks_tt=[4, None, None],
            ranks_tucker=[2, None, 2, None],
            ranks_cp=[None, None, 3, 3],
        )
    )
    check_one_tensor(
        tn.rand([6, 7, 8, 9], ranks_tt=[None, 4, 4], ranks_tucker=2, ranks_cp=[3, None, None, None])
    )

    rng = np.random.RandomState(32)
    for i in range(8):
        check_one_tensor(random_format([6, 7, 8, 9], rng=rng))

    t = tn.rand([6, 7, 8, 9], ranks_cp=[3, 3, 3, 3])
    t.cores[-1] = t.cores[-1].transpose(1, 0)[:, :, None]
    check_one_tensor(t)

    t = tn.rand([6, 7, 8, 9], ranks_tt=3, batch=True)
    check(t.numpy(), t, 0)
    check(t.numpy(), t, [0, 1])


def test_batch():
    BATCH_CATALOG = [
        ([0, 0, 0], None, None, 3),
        ([0, 0, 0, 0, 0], slice(None), None, 0),
        (0, [0]),
        ([0], None, None, None, 0, 1),
        (slice(None), [0, 1, 2, 3, 4, 5], [0, 1, 2, 3, 4, 5]),
        (slice(None), slice(None), slice(None), 0),
        (slice(None), slice(None), [0, 1], 0),
        (0, np.array([0]), None, 0),
        (slice(None), slice(None), slice(None), slice(None), None),
    ]
    check_one_tensor(tn.rand([6, 7, 8, 9], ranks_tt=3, batch=True), BATCH_CATALOG)
    check_one_tensor(tn.rand([6, 7, 8, 9], ranks_tucker=3, batch=True), BATCH_CATALOG)
    check_one_tensor(tn.rand([6, 7, 8, 9], ranks_cp=3, batch=True), BATCH_CATALOG)

    with raises(ValueError):
        tn.rand([6, 7, 8, 9], ranks_tt=3, batch=True)[None, ...]
    with raises(ValueError):
        tn.rand([6, 7, 8, 9], ranks_tt=3, batch=True)[[0], [0]]


def test_setitem():
    for i in range(5):
        t = tn.rand([5, 6, 7], ranks_tt=3)
        x = t.numpy().copy()
        t[1, :, 2] = 0
        x[1, :, 2] = 0
        assert np.linalg.norm(t.numpy() - x) <= 1e-9 * np.linalg.norm(x)

        t = tn.rand([5, 6, 7], ranks_tt=3)
        x = t.numpy().copy()
        v = np.random.rand(2, 6, 7)
        t[1:3] = v
        x[1:3] = v
        assert np.linalg.norm(t.numpy() - x) <= 1e-9 * np.linalg.norm(x)

        t = tn.rand([5, 6, 7], ranks_tt=2)
        x = t.numpy().copy()
        t[0, 0, 0] = 5.0
        x[0, 0, 0] = 5.0
        assert np.linalg.norm(t.numpy() - x) <= 1e-9 * np.linalg.norm(x)
