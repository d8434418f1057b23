"""Dense round-trip tests (reference tests/test_init.py)."""

import numpy as np

import tntorch_tpu as tn

np.random.seed(5)


def test_from_ndarray():
    for i in range(12):
        gt = np.random.rand(*np.random.randint(1, 8, np.random.randint(1, 6)))
        t = tn.Tensor(gt)
        reco = t.numpy()
        assert np.linalg.norm(gt - reco) / np.linalg.norm(gt) <= 1e-7


def test_constructors():
    t = tn.ones(4, 5)
    assert np.allclose(t.numpy(), np.ones((4, 5)))
    t = tn.zeros(4, 5)
    assert np.allclose(t.numpy(), np.zeros((4, 5)))
    t = tn.full([4, 5], 3.5)
    assert np.allclose(t.numpy(), np.full((4, 5), 3.5))
    t = tn.eye(5)
    assert np.allclose(t.numpy(), np.eye(5))
    t = tn.arange(7)
    assert np.allclose(t.numpy(), np.arange(7))
    t = tn.linspace(0, 1, 11)
    assert np.allclose(t.numpy(), np.linspace(0, 1, 11))
    t = tn.logspace(0, 2, 5)
    assert np.allclose(t.numpy(), np.logspace(0, 2, 5))
    g = tn.gaussian(10, 12)
    assert abs(float(tn.sum(g)) - 1) < 1e-10
    for fn in (tn.ones_like, tn.zeros_like, tn.rand_like, tn.randn_like):
        assert fn(t).shape == t.shape
    assert tn.full_like(t, 2.0).shape == t.shape
    assert tn.gaussian_like(g).shape == g.shape
