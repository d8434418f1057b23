"""Batch-lifted analytics (VERDICT r2 #5) + broadcast/assignment fixes (#8).

The reference rejects batch tensors in sum/mean/var/std (metrics.py:18-23);
here they are vmap-style lifted: batch-vs-loop oracles per function. Also
covers the _broadcast non-multiple rejection (the reference silently rounds,
tensor.py:2290-2306) and last-write duplicate-index assignment.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tntorch_tpu as tn

np.random.seed(31)


def _batch_and_dense(B=3, shape=(4, 5, 6), seed=0):
    t = tn.rand((B,) + shape, ranks_tt=3, batch=True, key=jax.random.key(seed))
    return t, np.asarray(t.numpy())


def test_batch_sum_mean_var_std_vs_loop():
    t, dense = _batch_and_dense()
    axes = tuple(range(1, dense.ndim))
    np.testing.assert_allclose(np.asarray(tn.sum(t)), dense.sum(axis=axes), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(tn.mean(t)), dense.mean(axis=axes), rtol=1e-10)
    np.testing.assert_allclose(
        np.asarray(tn.var(t)), dense.var(axis=axes), rtol=1e-8, atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(tn.std(t)), dense.std(axis=axes), rtol=1e-8, atol=1e-12
    )
    # batch-vs-loop: each per-sample value matches the non-batch path
    for b in range(dense.shape[0]):
        tb = tn.Tensor(dense[b])
        assert abs(float(tn.sum(t)[b]) - float(tn.sum(tb))) < 1e-8
        assert abs(float(tn.var(t)[b]) - float(tn.var(tb))) < 1e-8


def test_batch_partial_sum_keeps_batch():
    t, dense = _batch_and_dense()
    s = tn.sum(t, dim=1)
    assert s.batch
    np.testing.assert_allclose(np.asarray(s.numpy()), dense.sum(axis=2), rtol=1e-10)
    s0 = tn.sum(t, dim=0, keepdim=True)
    assert s0.shape == (dense.shape[0], 1) + dense.shape[2:]


def test_batch_mean_var_with_marginals():
    t, dense = _batch_and_dense()
    shape = dense.shape[1:]
    rs = np.random.RandomState(5)
    margs = [rs.rand(s) + 0.1 for s in shape]
    w = margs[0][:, None, None] * margs[1][None, :, None] * margs[2][None, None, :]
    w = w / w.sum()
    m = np.asarray(tn.mean(t, marginals=margs))
    np.testing.assert_allclose(m, (dense * w).sum(axis=(1, 2, 3)), rtol=1e-9)
    v = np.asarray(tn.var(t, marginals=margs))
    ref = ((dense - m[:, None, None, None]) ** 2 * w).sum(axis=(1, 2, 3))
    np.testing.assert_allclose(v, ref, rtol=1e-8)


def test_per_sample_scalar_arithmetic():
    t, dense = _batch_and_dense()
    c = np.linspace(-2.0, 3.0, dense.shape[0])
    np.testing.assert_allclose(
        np.asarray((t + c).numpy()), dense + c[:, None, None, None], rtol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray((t * c).numpy()), dense * c[:, None, None, None], rtol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray((t - jnp.asarray(c)).numpy()),
        dense - c[:, None, None, None],
        rtol=1e-10,
    )


def test_broadcast_rejects_non_multiples():
    a = tn.rand((2, 3), ranks_tt=2, key=jax.random.key(1))
    b = tn.rand((3, 3), ranks_tt=2, key=jax.random.key(2))
    with pytest.raises(ValueError, match="not integer multiples"):
        a + b
    with pytest.raises(ValueError, match="not integer multiples"):
        a * b
    # integer multiples still broadcast (reference-compatible)
    c = tn.rand((1, 3), ranks_tt=1, key=jax.random.key(3))
    d = tn.rand((4, 3), ranks_tt=2, key=jax.random.key(4))
    assert (c + d).shape == (4, 3)


def test_mixed_batchness_rejected():
    a = tn.rand((2, 3, 3), ranks_tt=2, batch=True, key=jax.random.key(5))
    b = tn.rand((3, 3), ranks_tt=2, key=jax.random.key(6))
    with pytest.raises(ValueError, match="batch"):
        b + a
    with pytest.raises(ValueError, match="batch"):
        b * a


def test_duplicate_fancy_index_assignment_last_write():
    t = tn.rand((5, 6, 7), ranks_tt=3, key=jax.random.key(7))
    d = np.array(t.numpy())
    v = tn.rand((3, 6, 7), ranks_tt=2, key=jax.random.key(8))
    t[[0, 2, 0]] = v
    d[[0, 2, 0]] = v.numpy()
    np.testing.assert_allclose(np.asarray(t.numpy()), d, atol=1e-12)

    t2 = tn.rand((5, 4), ranks_tt=2, key=jax.random.key(9))
    d2 = np.array(t2.numpy())
    t2[[1, -1, 1]] = 3.14
    d2[[1, -1, 1]] = 3.14
    np.testing.assert_allclose(np.asarray(t2.numpy()), d2, atol=1e-12)


def test_batch_anova_sobol_vs_loop():
    """VERDICT r2 #5 (second half): anova_decomposition / sobol /
    mean_dimension / dimension_distribution / truncate_anova lifted to
    batch; per-sample values match the non-batch path exactly."""
    rng = np.random.RandomState(41)
    B, shape = 3, (6, 6, 6)
    xb = rng.standard_normal((B,) + shape)
    tb = tn.Tensor(jnp.asarray(xb), batch=True)
    syms = tn.symbols(3)

    a = tn.anova_decomposition(tb)
    u = tn.undo_anova_decomposition(a)
    np.testing.assert_allclose(np.asarray(u.numpy()), xb, atol=1e-10)

    sb = np.asarray(tn.sobol(tb, tn.only(syms[0])))
    md = np.asarray(tn.mean_dimension(tb))
    dd = np.asarray(tn.dimension_distribution(tb))
    tr = tn.truncate_anova(tb, tn.only(syms[0] | syms[1]), keepdim=True)
    margs = [rng.rand(6) + 0.1 for _ in range(3)]
    sm = np.asarray(tn.sobol(tb, tn.only(syms[0]), marginals=margs))
    for b in range(B):
        t1 = tn.Tensor(jnp.asarray(xb[b]))
        assert abs(sb[b] - float(tn.sobol(t1, tn.only(syms[0])))) < 1e-10
        assert abs(md[b] - float(tn.mean_dimension(t1))) < 1e-10
        assert np.abs(dd[b] - np.asarray(tn.dimension_distribution(t1))).max() < 1e-10
        assert abs(sm[b] - float(tn.sobol(t1, tn.only(syms[0]), marginals=margs))) < 1e-10
        tr1 = tn.truncate_anova(t1, tn.only(syms[0] | syms[1]), keepdim=True)
        assert np.linalg.norm(np.asarray(tr.numpy()[b]) - np.asarray(tr1.numpy())) < 1e-10


def test_batch_partial_k_dot():
    """Batch partial-k dot folds Lprod into batched trailing cores."""
    rng = np.random.RandomState(42)
    B = 3
    x1 = rng.standard_normal((B, 4, 5, 6))
    x2 = rng.standard_normal((B, 4, 5))
    t1 = tn.Tensor(jnp.asarray(x1), batch=True)
    t2 = tn.Tensor(jnp.asarray(x2), batch=True)
    out = tn.dot(t1, t2, k=2)
    assert out.batch
    want = np.einsum("bijk,bij->bk", x1, x2)
    np.testing.assert_allclose(np.asarray(out.numpy()), want, atol=1e-10)


def test_batch_optimize_matches_per_sample_fits():
    """optimize() on a batch tensor: an elementwise optimizer with a
    per-sample-separable loss updates each sample independently, so the
    batch fit equals two single fits from the same inits (the reference
    rejects batch in its parameter collection, autodiff.py:39-40)."""
    rng = np.random.RandomState(5)
    B, shape, R = 2, [6, 6, 6], 3
    targets = jnp.asarray(rng.standard_normal((B, *shape)))
    init = jnp.asarray(rng.standard_normal((B, *shape)))

    def fit(t, target_dense, iters=60):
        def loss(a):
            # normsq of a batch tensor is per-sample (B,); the summed loss
            # is separable, so each sample's update is independent
            return jnp.sum(tn.normsq(a + (-1.0) * tn.Tensor(
                target_dense, batch=target_dense.ndim == 4)))
        tn.optimize([t], loss, max_iter=iters, tol=0.0, verbose=False)
        return t

    tb = tn.Tensor(init, ranks_tt=R, batch=True)
    tb.requires_grad = True
    fit(tb, targets)

    for b in range(B):
        t1 = tn.Tensor(init[b], ranks_tt=R)
        t1.requires_grad = True
        fit(t1, targets[b])
        np.testing.assert_allclose(
            np.asarray(tb.numpy()[b]), np.asarray(t1.numpy()), atol=1e-8
        )


def test_batch_derivatives_vs_loop():
    """Batch partial/gradient/partialset/active_subspace/dgsm/laplacian
    match per-sample results (the reference rejects batch throughout
    derivatives.py)."""
    rng = np.random.RandomState(9)
    B = 2
    xb = rng.standard_normal((B, 7, 7, 7))
    tb = tn.Tensor(jnp.asarray(xb), batch=True, ranks_tt=5)
    singles = [tn.Tensor(jnp.asarray(xb[b]), ranks_tt=5) for b in range(B)]

    # partial (non-periodic + periodic)
    for kw in ({}, {"periodic": True}):
        pb = tn.partial(tb, 1, **kw).numpy()
        for b in range(B):
            np.testing.assert_allclose(
                pb[b], tn.partial(singles[b], 1, **kw).numpy(), atol=1e-9
            )

    # gradient
    gb = tn.gradient(tb)
    for b in range(B):
        g1 = tn.gradient(singles[b])
        for d in range(3):
            np.testing.assert_allclose(gb[d].numpy()[b], g1[d].numpy(), atol=1e-9)

    # partialset
    psb = tn.partialset(tb, order=1).numpy()
    for b in range(B):
        np.testing.assert_allclose(
            psb[b], tn.partialset(singles[b], order=1).numpy(), atol=1e-8
        )

    # active_subspace / dgsm
    wb, vb = tn.active_subspace(tb)
    db = np.asarray(tn.dgsm(tb))
    assert wb.shape == (B, 3) and vb.shape == (B, 3, 3) and db.shape == (B, 3)
    for b in range(B):
        w1, v1 = tn.active_subspace(singles[b])
        np.testing.assert_allclose(np.asarray(wb)[b], np.asarray(w1), atol=1e-8)
        # eigenvectors match up to sign
        for k in range(3):
            c = np.asarray(vb)[b][:, k] @ np.asarray(v1)[:, k]
            np.testing.assert_allclose(
                np.asarray(vb)[b][:, k], np.sign(c) * np.asarray(v1)[:, k], atol=1e-7
            )
        np.testing.assert_allclose(db[b], np.asarray(tn.dgsm(singles[b])), atol=1e-8)

    # laplacian / divergence ride partial
    lb = tn.laplacian(tb).numpy()
    for b in range(B):
        np.testing.assert_allclose(lb[b], tn.laplacian(singles[b]).numpy(), atol=1e-8)

    # Tucker-factor batch path in partial
    tt = tb.clone()
    tt.round_tucker(rmax=5)
    if any(U is not None for U in tt.Us):
        pb = tn.partial(tt, 0).numpy()
        for b in range(B):
            # per-sample oracle from the batch tensor itself
            dense = tt.numpy()[b]
            s1 = tn.Tensor(jnp.asarray(dense), ranks_tt=7)
            np.testing.assert_allclose(
                pb[b], tn.partial(s1, 0).numpy(), atol=1e-7
            )


def test_batch_dense_metric_mixing():
    """dist/relative_error/rmse/r_squared/dot between a batch Tensor and
    dense data return per-sample (B,) values (the reference's _process
    rejects batch, metrics.py:18-23). The dense side may be (B, ...) or a
    single unbatched array broadcast across the ensemble."""
    rng = np.random.RandomState(17)
    B, shape = 3, (5, 6, 4)
    xb = rng.standard_normal((B,) + shape)
    yb = xb + 0.1 * rng.standard_normal((B,) + shape)
    tb = tn.Tensor(jnp.asarray(xb), batch=True)

    for fn, oracle in [
        (tn.dist, lambda a, b: np.linalg.norm((a - b).reshape(B, -1), axis=-1)),
        (tn.relative_error, lambda a, b: np.linalg.norm((a - b).reshape(B, -1), axis=-1)
         / np.linalg.norm(a.reshape(B, -1), axis=-1)),
        (tn.rmse, lambda a, b: np.linalg.norm((a - b).reshape(B, -1), axis=-1)
         / np.sqrt(np.prod(shape))),
    ]:
        out = np.asarray(fn(tb, yb))
        assert out.shape == (B,)
        np.testing.assert_allclose(out, oracle(xb, yb), atol=1e-9)

    # relative_error with args swapped (dense gt, batch approx)
    out = np.asarray(tn.relative_error(yb, tb))
    np.testing.assert_allclose(
        out,
        np.linalg.norm((yb - xb).reshape(B, -1), axis=-1)
        / np.linalg.norm(yb.reshape(B, -1), axis=-1),
        atol=1e-9,
    )

    # r_squared per sample
    r2 = np.asarray(tn.r_squared(tb, yb))
    for b in range(B):
        d = np.linalg.norm(xb[b] - yb[b])
        dm = np.linalg.norm(xb[b] - xb[b].mean())
        np.testing.assert_allclose(r2[b], 1 - d**2 / dm**2, atol=1e-9)

    # dot vs dense and a single broadcast dense side
    out = np.asarray(tn.dot(tb, yb))
    np.testing.assert_allclose(
        out, (xb.reshape(B, -1) * yb.reshape(B, -1)).sum(-1), atol=1e-8
    )
    single = rng.standard_normal(shape)
    out1 = np.asarray(tn.dist(tb, single))
    np.testing.assert_allclose(
        out1, np.linalg.norm((xb - single).reshape(B, -1), axis=-1), atol=1e-9
    )

    # non-batch behavior unchanged (scalar returns)
    t0 = tn.Tensor(jnp.asarray(xb[0]))
    assert np.ndim(np.asarray(tn.dist(t0, yb[0]))) == 0
    assert np.ndim(np.asarray(tn.r_squared(t0, yb[0]))) == 0


def test_batch_hadamard_sum_exact():
    """Exact hadamard_sum of batch tensors: vmapped contraction, per-sample
    (B,) values matching the non-batch path and the dense oracle."""
    rng = np.random.RandomState(23)
    B, shape, K = 2, (5, 4, 6), 3
    denses = [rng.standard_normal((B,) + shape) for _ in range(K)]
    ts = [tn.Tensor(jnp.asarray(d), batch=True) for d in denses]
    out = np.asarray(tn.hadamard_sum(ts))
    assert out.shape == (B,)
    prod = np.ones((B,) + shape)
    for d in denses:
        prod = prod * d
    np.testing.assert_allclose(out, prod.reshape(B, -1).sum(-1), rtol=1e-9)
    for b in range(B):
        single = float(tn.hadamard_sum([tn.Tensor(jnp.asarray(d[b])) for d in denses]))
        np.testing.assert_allclose(out[b], single, rtol=1e-10)
    # MRF mode is also batch-lifted (per-sample passes); same values
    mrf = np.asarray(tn.hadamard_sum(ts, algorithm="eig", eps=1e-12))
    np.testing.assert_allclose(mrf, out, rtol=1e-8)


def test_batch_elementwise_via_cross():
    """Elementwise ops on batch tensors (exp, reciprocal via /, **) run
    per-sample crosses and stack at zero-padded common ranks (the reference
    rejects batch in cross, cross.py:256-258)."""
    rng = np.random.RandomState(29)
    B, shape = 2, (6, 6, 6)
    xb = 1.0 + 0.5 * rng.rand(B, *shape)  # positive, away from 0
    tb = tn.Tensor(jnp.asarray(xb), batch=True)

    e = tn.exp(tb, eps=1e-9)
    assert e.batch
    np.testing.assert_allclose(np.asarray(e.numpy()), np.exp(xb), rtol=1e-6)

    r = 1.0 / tb
    np.testing.assert_allclose(np.asarray(r.numpy()), 1.0 / xb, rtol=1e-6)

    p = tb ** 2
    np.testing.assert_allclose(np.asarray(p.numpy()), xb ** 2, rtol=1e-6)

    # per-sample parity with the non-batch path
    e0 = tn.exp(tn.Tensor(jnp.asarray(xb[0])), eps=1e-9)
    np.testing.assert_allclose(np.asarray(e.numpy())[0], np.asarray(e0.numpy()), rtol=1e-6)

    # Batched return_info comes back as a per-sample info list (r4: the
    # restriction was lifted, VERDICT r3 missing #3)
    eb, infos = tn.cross(function=jnp.exp, tensors=[tb], return_info=True,
                         verbose=False, seed=0)
    assert isinstance(infos, list) and len(infos) == B
    np.testing.assert_allclose(np.asarray(eb.numpy()), np.exp(xb), rtol=1e-5)


def test_batch_skew_kurtosis():
    """skew/kurtosis ride cross-based powers, so the batch cross lift makes
    them per-sample too."""
    from scipy import stats

    rng = np.random.RandomState(33)
    xb = 1.0 + 0.5 * rng.rand(2, 6, 6, 6)
    tb = tn.Tensor(jnp.asarray(xb), batch=True)
    s = np.asarray(tn.skew(tb))
    k = np.asarray(tn.kurtosis(tb))
    for b in range(2):
        np.testing.assert_allclose(s[b], stats.skew(xb[b].ravel()), rtol=1e-5)
        np.testing.assert_allclose(
            k[b], stats.kurtosis(xb[b].ravel(), fisher=True), rtol=1e-4, atol=1e-8
        )


def test_batch_raw_and_normalized_moments_vs_loop():
    """Regression: raw_moment divided batched hadamard_sum by t.numel()
    (which includes B), so batch moments were wrong by a factor 1/B."""
    t, dense = _batch_and_dense(B=3, shape=(4, 4, 4), seed=5)
    for k in (2, 3):
        rm = np.asarray(tn.raw_moment(t, k, algorithm="exact"))
        nm = np.asarray(tn.normalized_moment(t, k, algorithm="exact", eps=1e-12))
        assert rm.shape == (3,)
        for b in range(3):
            tb = tn.Tensor(dense[b])
            assert abs(rm[b] - float(tn.raw_moment(tb, k, algorithm="exact"))) < 1e-8
            assert (
                abs(nm[b] - float(tn.normalized_moment(tb, k, algorithm="exact", eps=1e-12)))
                < 1e-7
            )


def test_batch_raw_moment_marginals_vs_loop():
    t, dense = _batch_and_dense(B=2, shape=(4, 4, 4), seed=6)
    marg = [np.random.rand(4) + 0.1 for _ in range(3)]
    rm = np.asarray(tn.raw_moment(t, 2, marginals=marg, algorithm="exact"))
    for b in range(2):
        tb = tn.Tensor(dense[b])
        ref = float(tn.raw_moment(tb, 2, marginals=marg, algorithm="exact"))
        assert abs(rm[b] - ref) < 1e-8


def test_cross_batch_size_mismatch_raises():
    """Regression: mismatched batch sizes silently clamped to the last
    sample through JAX out-of-bounds indexing."""
    t1 = tn.rand((3, 4, 4), ranks_tt=2, batch=True, key=jax.random.key(0))
    t2 = tn.rand((2, 4, 4), ranks_tt=2, batch=True, key=jax.random.key(1))
    with pytest.raises(ValueError, match="Batch sizes differ"):
        tn.cross(function=lambda a, b: a * b, tensors=[t1, t2])


def test_stack_public_api():
    singles = [
        tn.rand((4, 5), ranks_tt=2, key=jax.random.key(0)),
        tn.rand((4, 5), ranks_tt=3, key=jax.random.key(1)),  # heterogeneous ranks
    ]
    tb = tn.stack(singles)
    assert tb.batch and tb.shape[0] == 2
    for b, s in enumerate(singles):
        np.testing.assert_allclose(np.asarray(tb.numpy())[b], np.asarray(s.numpy()), rtol=1e-10)
    with pytest.raises(ValueError, match="equal shapes"):
        tn.stack([singles[0], tn.rand((4, 6), ranks_tt=2, key=jax.random.key(2))])
    with pytest.raises(ValueError, match="non-batch"):
        tn.stack([tb])


def test_batch_mask_tensor_index_rejected():
    t = tn.rand((2, 2, 2, 2), ranks_tt=2, batch=True, key=jax.random.key(0))
    mask = tn.stack([tn.weight_mask(4, 1), tn.weight_mask(4, 2)])
    with pytest.raises(ValueError, match="Batch mask"):
        t[mask]


def test_batch_hadamard_sum_mrf_vs_loop():
    """MRF-mode hadamard_sum on batch tensors: per-sample loop lift."""
    t, dense = _batch_and_dense(B=2, shape=(4, 4, 4), seed=9)
    got = np.asarray(tn.hadamard_sum([t, t, t], algorithm="eig", eps=1e-12))
    assert got.shape == (2,)
    for b in range(2):
        tb = tn.Tensor(dense[b])
        ref = float(tn.hadamard_sum([tb, tb, tb], algorithm="eig", eps=1e-12))
        assert abs(got[b] - ref) < 1e-8 * max(abs(ref), 1.0)
    exact = np.asarray(tn.hadamard_sum([t, t, t], algorithm="exact"))
    np.testing.assert_allclose(got, exact, rtol=1e-8)


def test_batch_minimum_maximum_argmin_argmax():
    """Batch min/max: per-sample loop lift (the reference rejects batch in
    cross; minimize pivoting is data-dependent per sample)."""
    B, shape = 3, (8, 8, 8)
    rng = np.random.default_rng(11)
    dense = rng.standard_normal((B,) + shape)
    singles = [tn.Tensor(jnp.asarray(dense[b]), eps=1e-14) for b in range(B)]
    t = tn.stack(singles)
    mn = np.asarray(tn.minimum(t, rmax=8, max_iter=12))
    mx = np.asarray(tn.maximum(t, rmax=8, max_iter=12))
    am = tn.argmin(t, rmax=8, max_iter=12)
    ax = tn.argmax(t, rmax=8, max_iter=12)
    assert mn.shape == (B,) and mx.shape == (B,)
    assert isinstance(am, list) and len(am) == B
    for b in range(B):
        # Global optimum of a smooth-rank surrogate is an ESTIMATE; on exact
        # TT input (eps=1e-14 decomposition, full rank 8^3) it is exact
        assert abs(mn[b] - dense[b].min()) < 1e-8, (b, mn[b], dense[b].min())
        assert abs(mx[b] - dense[b].max()) < 1e-8, (b, mx[b], dense[b].max())
        assert dense[b][tuple(am[b])] == dense[b].min()
        assert dense[b][tuple(ax[b])] == dense[b].max()
    with pytest.raises(ValueError, match="mix batch"):
        tn.minimum([t, singles[0]])
