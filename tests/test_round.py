"""Orthogonalization / truncated SVD / rounding tests (reference tests/test_round.py)."""

import jax
import jax.numpy as jnp
import numpy as np

import tntorch_tpu as tn



def test_orthogonalization():
    rng = np.random.RandomState(20)
    for i in range(6):
        gt = tn.rand(rng.randint(1, 8, rng.randint(2, 6)))
        t = gt.clone()
        assert tn.relative_error(gt, t) <= 1e-7
        t.left_orthogonalize(0)
        assert tn.relative_error(gt, t) <= 1e-7
        t.right_orthogonalize(t.dim() - 1)
        assert tn.relative_error(gt, t) <= 1e-7
        t.orthogonalize(rng.randint(t.dim()))
        assert tn.relative_error(gt, t) <= 1e-7


def test_truncated_svd_batch():
    gt = jnp.asarray(np.random.RandomState(21).rand(2, 32, 32))
    u, v = tn.truncated_svd(gt, batch=True)
    for i in range(len(gt)):
        u1, v1 = tn.truncated_svd(gt[i], batch=False)
        assert np.allclose(u1, u[i])
        assert np.allclose(v1, v[i])


def test_truncated_svd_eig_batch():
    gt = jnp.asarray(np.random.RandomState(22).rand(2, 32, 32))
    u, v = tn.truncated_svd(gt, batch=True, algorithm="eig")
    for i in range(len(gt)):
        u1, v1 = tn.truncated_svd(gt[i], batch=False, algorithm="eig")
        assert np.allclose(u1, u[i], atol=1e-6)
        assert np.allclose(v1, v[i], atol=1e-6)


def test_truncated_svd_reconstruct():
    M = jnp.asarray(np.random.RandomState(23).rand(20, 15))
    for left_ortho in (True, False):
        for algorithm in ("svd", "eig"):
            u, v = tn.truncated_svd(M, left_ortho=left_ortho, algorithm=algorithm)
            assert np.linalg.norm(u @ v - M) <= 1e-6
            q = u if left_ortho else v.T
            assert np.allclose(np.asarray(q.T @ q), np.eye(q.shape[1]), atol=1e-6)


def test_round_tt_svd():
    rng = np.random.RandomState(24)
    for i in range(4):
        gt = tn.rand(rng.randint(1, 8, rng.randint(8, 10)), ranks_tt=rng.randint(1, 10))
        gt.round_tt(1e-8, algorithm="svd")
        t = gt + gt
        t.round_tt(1e-8, algorithm="svd")
        assert tn.relative_error(gt, t / 2) <= 1e-4
        assert max(gt.ranks_tt) == max(t.ranks_tt)


def test_round_tt_eig():
    rng = np.random.RandomState(25)
    for i in range(4):
        gt = tn.rand(rng.randint(1, 8, rng.randint(8, 10)), ranks_tt=rng.randint(1, 10))
        gt.round_tt(1e-8, algorithm="eig")
        t = gt + gt
        t.round_tt(1e-8, algorithm="eig")
        assert tn.relative_error(gt, t / 2) <= 1e-7


def test_round_tucker():
    rng = np.random.RandomState(26)
    for i in range(4):
        eps = rng.rand() ** 2
        gt = tn.rand([32] * 4, ranks_tt=8, ranks_tucker=8)
        t = gt.clone()
        t.round_tucker(eps=eps)
        assert tn.relative_error(gt, t) <= eps


def test_round_tt_gram():
    # Fixed-rank Gram path (jitted, all-matmul) recovers exact ranks
    rng = np.random.RandomState(28)
    for i in range(5):
        gt = tn.rand(rng.randint(2, 8, rng.randint(3, 6)), ranks_tt=rng.randint(1, 6))
        t = gt + gt
        t.round_tt(rmax=[int(r) for r in gt.ranks_tt[1:-1]], algorithm="gram")
        assert tn.relative_error(gt, t / 2) <= 1e-7
        assert max(gt.ranks_tt) == max(t.ranks_tt)
    # batch variant
    gt = tn.rand([4, 6, 7, 8], ranks_tt=3, batch=True)
    t = gt + gt
    t.round_tt(rmax=3, algorithm="gram")
    assert np.linalg.norm(t.numpy() - 2 * gt.numpy()) <= 1e-7


def test_round_combined():
    x = np.random.RandomState(27).rand(10, 10, 10)
    t = tn.Tensor(x)
    t.round(1e-8)
    assert np.linalg.norm(t.numpy() - x) / np.linalg.norm(x) <= 1e-7


def test_round_tt_eps_jit_matches_svd():
    # The adaptive-eps jitted path (algorithm='eig' on pure TT) must pick the
    # same ranks as the eager SVD path and respect the error bound
    rng = np.random.RandomState(29)
    for i in range(4):
        eps = 10 ** rng.uniform(-6, -1)
        gt = tn.rand([10] * 5, ranks_tt=5)
        t1 = gt.clone()
        t1.round_tt(eps, algorithm="eig")
        t2 = gt.clone()
        t2.round_tt(eps, algorithm="svd")
        assert list(t1.ranks_tt) == list(t2.ranks_tt)
        assert float(tn.relative_error(gt, t1)) <= eps * 1.01


def test_round_tucker_jit_matches_eager():
    # The jitted masked Tucker kernel must pick the same ranks as the eager
    # per-mode path (reached by supplying explicit identity factors)
    for eps in (1e-10, 1e-3, 0.2):
        gt = tn.rand([12] * 4, ranks_tt=6)
        t1 = gt.clone()
        t1.round_tucker(eps=eps, algorithm="eig")
        t2 = gt.clone()
        t2.Us = [jnp.eye(12, dtype=t2.cores[0].dtype) for _ in range(4)]
        t2.round_tucker(eps=eps, algorithm="eig")
        assert list(t1.ranks_tucker) == list(t2.ranks_tucker)
        e1 = np.linalg.norm(t1.numpy() - gt.numpy()) / np.linalg.norm(gt.numpy())
        assert e1 <= max(eps, 1e-12) * 1.01


def test_round_tucker_jit_svd_rmax_dim():
    gt = tn.rand([10] * 3, ranks_tt=5)
    t = gt.clone()
    t.round_tucker(eps=1e-2, rmax=3, algorithm="svd")
    assert max(t.ranks_tucker) <= 3
    # dim= only rescales the error budget (reference truncates all modes)
    gt = tn.rand([8] * 4, ranks_tt=4)
    t = gt.clone()
    t.round_tucker(eps=1e-3, dim=[1, 2])
    e = np.linalg.norm(t.numpy() - gt.numpy()) / np.linalg.norm(gt.numpy())
    assert e <= 1e-3 * 1.01


def test_round_tt_svd_jit_matches_eager():
    # algorithm='svd' now routes through the one-program masked kernel;
    # verbose=True keeps the eager per-mode path -> same ranks, same values
    rng = np.random.RandomState(30)
    for i in range(4):
        eps = 10 ** rng.uniform(-8, -1)
        gt = tn.rand([9] * 5, ranks_tt=6)
        t = gt + gt
        t1 = t.clone()
        t1.round_tt(eps, algorithm="svd")
        t2 = t.clone()
        t2.round_tt(eps, algorithm="svd", verbose=True)
        assert list(t1.ranks_tt) == list(t2.ranks_tt)
        e = np.linalg.norm(t1.numpy() - t2.numpy()) / np.linalg.norm(t2.numpy())
        assert e <= 1e-10


def test_round_tt_batch_jit():
    # Batch rounding is ONE vmapped XLA program (fixed ranks); must agree
    # with the per-sample eager sweep in values and ranks
    gt = tn.rand([4, 6, 7, 8], ranks_tt=5, batch=True)
    t = gt + gt
    t.round_tt(rmax=5)
    assert np.linalg.norm(t.numpy() - 2 * gt.numpy()) <= 1e-8
    assert list(t.ranks_tt) == list(gt.ranks_tt)
    # rmax=None keeps min(rows, cols) per edge, like the reference batch rule
    t2 = gt + gt
    t2.round_tt()
    assert np.linalg.norm(t2.numpy() - 2 * gt.numpy()) <= 1e-8


def test_round_tt_gram_with_tucker_factors():
    """algorithm='gram' on a TT-Tucker tensor: non-orthogonal factors are
    ORTHOGONALIZED first (non-orthogonality pushed into the cores), so
    truncation happens in the right metric while the Tucker structure
    survives. Complex cores round through the (Hermitian) Gram kernels."""
    t = tn.rand([10] * 3, ranks_tt=6, ranks_tucker=5, key=jax.random.key(50))
    dense = t.numpy()
    s = t + t
    s.round_tt(rmax=6, algorithm="gram")
    assert np.linalg.norm(s.numpy() - 2 * dense) / np.linalg.norm(dense) <= 1e-9
    assert any(U is not None for U in s.Us)  # structure preserved

    c = tn.rand([6] * 3, ranks_tt=3, key=jax.random.key(51))
    c.cores = [jnp.asarray(x, dtype=jnp.complex128) for x in c.cores]
    ref = np.array(c.numpy())
    c.round_tt(rmax=3, algorithm="gram")  # exact rank: lossless
    assert np.linalg.norm(np.array(c.numpy()) - ref) / np.linalg.norm(ref) <= 1e-9


def test_round_budget_from_kernel_spectra():
    """round()'s Tucker budget comes from the rounding kernels' own discarded
    spectra on the jitted paths (VERDICT r3 next-round #8): the in-kernel
    achieved error equals the eager relative_error to roundoff, and round()
    stays within eps end to end."""
    rng = np.random.default_rng(3)
    for algo in ("svd", "eig"):
        X = jnp.asarray(rng.standard_normal((10, 11, 12, 9)))
        t = tn.Tensor(X)
        copy = t.clone()
        t.round_tt(eps=0.1, algorithm=algo)
        assert t._round_reached_dev is not None
        eager = float(tn.relative_error(copy, t))
        kern = float(jnp.max(jnp.asarray(t._round_reached_dev)))
        assert abs(eager - kern) <= 1e-7 + 1e-10 * abs(eager), (algo, eager, kern)
    # rmax-capped discard is included in the in-kernel residual
    t = tn.Tensor(jnp.asarray(rng.standard_normal((12, 12, 12))), ranks_tt=10)
    copy = t.clone()
    t.round_tt(rmax=3)
    eager = float(tn.relative_error(copy, t))
    kern = float(jnp.max(jnp.asarray(t._round_reached_dev)))
    assert abs(eager - kern) <= 1e-10 * max(1.0, eager)
    # combined round() still meets eps (kernel-budgeted Tucker stage)
    X = jnp.asarray(rng.standard_normal((8, 8, 8, 8)))
    t = tn.Tensor(X)
    t.round(0.1)
    assert float(tn.relative_error(tn.Tensor(X), t)) <= 0.1 * 1.001
    # batch round() budgets off the worst sample without eager dot chains
    Xb = jnp.asarray(rng.standard_normal((3, 8, 8, 8)))
    tb = tn.Tensor(Xb, batch=True)
    sb = tb + tb
    sb.round(rmax=8)
    rel = np.linalg.norm(np.asarray(sb.numpy()) - 2 * np.asarray(Xb)) \
        / np.linalg.norm(2 * np.asarray(Xb))
    assert rel < 1e-10


def test_round_forwards_only_tucker_kwargs():
    """round(verbose=...) must not crash the Tucker stage: round_tt extras
    are filtered before forwarding (round_tucker takes eps/rmax/dim/
    algorithm only). Covers both the kernel-budget path (verbose=False) and
    the clone path (verbose=True)."""
    rng = np.random.default_rng(3)
    X = jnp.asarray(rng.standard_normal((8, 8, 8)))
    for verbose in (False, True):
        t = tn.Tensor(X, ranks_tt=6)
        s = t + t
        s.round(1e-10, algorithm="svd", verbose=verbose)
        assert list(s.ranks_tt) == [1, 6, 6, 1]
        rel = np.linalg.norm(np.asarray(s.numpy()) - 2 * np.asarray(t.numpy())) \
            / np.linalg.norm(2 * np.asarray(t.numpy()))
        assert rel < 1e-9
