"""Moments / hadamard_sum / skew / kurtosis tests (untested in the reference)."""

import jax
import numpy as np
from scipy import stats

import tntorch_tpu as tn

np.random.seed(14)


def test_skew_kurtosis():
    t = tn.rand([8, 8, 8], ranks_tt=3) + 0.5
    x = t.numpy().ravel()
    assert abs(float(tn.skew(t)) - stats.skew(x)) <= 5e-2
    assert abs(float(tn.kurtosis(t)) - stats.kurtosis(x)) <= 5e-2


def test_hadamard_sum_exact():
    ts = [tn.rand([5, 6, 7], ranks_tt=2) for _ in range(3)]
    gt = float(np.sum(ts[0].numpy() * ts[1].numpy() * ts[2].numpy()))
    assert abs(float(tn.hadamard_sum(ts)) - gt) <= 1e-8 * abs(gt)


def test_hadamard_sum_approx():
    ts = [tn.rand([5, 6, 7], ranks_tt=2) for _ in range(3)]
    gt = float(np.sum(ts[0].numpy() * ts[1].numpy() * ts[2].numpy()))
    approx = float(tn.hadamard_sum(ts, algorithm="eig", eps=1e-10))
    assert abs(approx - gt) <= 1e-6 * abs(gt)


def test_raw_and_normalized_moments():
    t = tn.rand([6, 6, 6], ranks_tt=2) + 1.0
    x = t.numpy().ravel()
    m2 = float(tn.raw_moment(t, 2))
    assert abs(m2 - np.mean(x**2)) <= 1e-6 * abs(np.mean(x**2))
    nm3 = float(tn.normalized_moment(t, 3))
    gt3 = np.mean((x - x.mean()) ** 3) / np.var(x) ** 1.5
    assert abs(nm3 - gt3) <= 1e-4


def test_dist_rmse_r2():
    a = tn.rand([6, 6], ranks_tt=2)
    b = tn.rand([6, 6], ranks_tt=2)
    xa, xb = a.numpy(), b.numpy()
    assert abs(float(tn.dist(a, b)) - np.linalg.norm(xa - xb)) <= 1e-8
    assert abs(float(tn.rmse(a, b)) - np.linalg.norm(xa - xb) / 6) <= 1e-8
    gt_r2 = 1 - np.linalg.norm(xa - xb) ** 2 / np.linalg.norm(xa - xa.mean()) ** 2
    assert abs(float(tn.r_squared(a, b)) - gt_r2) <= 1e-8
    # mixed compressed/dense
    assert abs(float(tn.relative_error(xa, a))) <= 1e-12


def test_hadamard_sum_one_mode_non_exact():
    # The loop-based (rounded) algorithm must not fall through on 1-D input
    # (the reference returns None there); raw_moment rides this path.
    t = tn.rand([10], ranks_tt=1, key=jax.random.key(11))
    hs = tn.hadamard_sum([t, t], algorithm="eig", eps=1e-10)
    ref = float((np.asarray(t.numpy()) ** 2).sum())
    assert hs is not None and abs(float(hs) - ref) <= 1e-8
    assert abs(float(tn.raw_moment(t, 2)) - ref / 10) <= 1e-8


def test_mean_negative_dims_with_marginals():
    t = tn.rand([4, 5], ranks_tt=2, key=jax.random.key(12))
    d = np.asarray(t.numpy())
    out = tn.mean(t, dim=[-1, -2], marginals=[np.ones(5), np.ones(4)])
    assert abs(float(out) - d.mean()) <= 1e-10


def test_batch_sum_after_squeeze_semantics():
    # squeeze counts modes; sum's batch path must pass mode indices unshifted
    t = tn.rand([2, 3, 4], ranks_tt=2, batch=True, key=jax.random.key(13))
    d = np.asarray(t.numpy())
    assert np.allclose(np.asarray(tn.sum(t)), d.sum(axis=(1, 2)))
    assert np.allclose(np.asarray(tn.sum(t, dim=0).numpy()), d.sum(axis=1))
