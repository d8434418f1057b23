"""Regression tests for latent defects found in the round-2 reviews —
most inherited verbatim from the reference and fixed here (the package's
contract is reference semantics WITH its latent defects fixed)."""

import jax
import jax.numpy as jnp
import numpy as np

import tntorch_tpu as tn


def test_partial_uses_the_right_modes_span():
    """partial(t, [d]) with default bounds must use mode d's span, not
    mode 0's (reference indexed the all-modes default by dim position)."""
    x = np.zeros((5, 50))
    x += np.linspace(0, 1, 50)[None, :]  # f = y-coordinate
    t = tn.Tensor(x)
    # default bounds use mode 1's span [0, 50]; explicit bounds [0, 1] give
    # a 50x larger derivative — the step ratio must equal the span ratio
    d = tn.partial(t, 1)
    d2 = tn.partial(t, [1], bounds=[[0, 1]])
    ratio = d.numpy()[2, 10] / d2.numpy()[2, 10]
    assert np.isclose(ratio, 1.0 / 50.0, rtol=1e-10)
    # interior central differences of a linear function are constant
    vals = d.numpy()[:, 1:-1]
    assert np.allclose(vals, vals[0, 0], rtol=1e-8)


def test_gradient_scalar_dim():
    t = tn.rand([8, 12], ranks_tt=2, key=jax.random.key(0))
    g = tn.gradient(t, dim=1)
    assert isinstance(g, tn.Tensor)
    gl = tn.gradient(t, dim=[1])
    assert np.allclose(g.numpy(), gl[0].numpy())


def test_curl_rejects_non_3d():
    ts = [tn.rand([4] * 4, ranks_tt=2) for _ in range(3)]
    try:
        tn.curl(ts)
        assert False, "curl accepted 4D fields"
    except AssertionError:
        pass


def test_batch_broadcast_add_mul():
    """Batch broadcasting: repeat counts are per-mode, excluding the leading
    batch axis (reference shifted them by one)."""
    rng = np.random.default_rng(0)
    xa = rng.standard_normal((2, 3, 1))
    xb = rng.standard_normal((2, 3, 4))
    a = tn.Tensor(jnp.asarray(xa), batch=True)
    b = tn.Tensor(jnp.asarray(xb), batch=True)
    s = a + b
    assert np.allclose(s.numpy(), xa + xb)
    p = a * b
    assert np.allclose(p.numpy(), xa * xb)


def test_batch_repeat_new_trailing_mode():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 3, 4))
    t = tn.Tensor(jnp.asarray(x), batch=True)
    r = t.repeat(1, 1, 5)
    assert np.allclose(r.numpy(), np.repeat(x[..., None], 5, axis=-1))


def test_convolve_valid_with_size1_mode():
    rng = np.random.default_rng(2)
    x1 = rng.standard_normal((6, 6))
    x2 = rng.standard_normal((1, 3))
    t1 = tn.Tensor(jnp.asarray(x1))
    t2 = tn.Tensor(jnp.asarray(x2))
    r = tn.convolve(t1, t2, mode="valid", eps=1e-10, verbose=False)
    from scipy.signal import convolve2d

    gt = convolve2d(x1, x2, mode="valid")
    assert r.numpy().shape == gt.shape
    assert np.linalg.norm(r.numpy() - gt) / np.linalg.norm(gt) <= 1e-6


def test_hadamard_sum_default_eps():
    ts = [tn.rand([5, 6, 7], ranks_tt=2, key=jax.random.key(k)) for k in range(2)]
    gt = float(np.sum(ts[0].numpy() * ts[1].numpy()))
    got = float(tn.hadamard_sum(ts, algorithm="eig"))
    assert abs(got - gt) <= 1e-8 * abs(gt)


def test_mean_scalar_dim_with_marginals():
    t = tn.rand([6, 8], ranks_tt=2, key=jax.random.key(3))
    m = jnp.asarray(np.random.default_rng(3).uniform(size=8))
    r = tn.mean(t, dim=1, marginals=[m])
    w = np.asarray(m) / np.asarray(m).sum()
    gt = (t.numpy() * w[None, :]).sum(axis=1)
    assert np.allclose(np.asarray(r.numpy()).ravel(), gt)


def test_batch_transpose_and_cat():
    rng = np.random.default_rng(4)
    x = rng.standard_normal((2, 3, 4, 5))
    t = tn.Tensor(jnp.asarray(x), batch=True)
    tt = tn.transpose(t)
    assert np.allclose(tt.numpy(), np.transpose(x, (0, 3, 2, 1)))

    y = rng.standard_normal((2, 6, 4, 5))
    s = tn.Tensor(jnp.asarray(y), batch=True)
    c = tn.cat(t, s, dim=0)  # concatenate along MODE 0 (not the batch axis)
    assert np.allclose(c.numpy(), np.concatenate([x, y], axis=1))


def test_create_key_gives_independent_cores():
    """Explicit key= must yield independent draws per core/factor (the key
    was previously passed verbatim to every draw -> bit-identical cores)."""
    t = tn.rand(4, 4, 4, 4, ranks_tt=3, key=jax.random.key(0))
    assert not np.array_equal(np.asarray(t.cores[1]), np.asarray(t.cores[2]))
    t2 = tn.rand(4, 4, 4, 4, ranks_tt=3, ranks_tucker=2, key=jax.random.key(0))
    assert not np.array_equal(np.asarray(t2.Us[0]), np.asarray(t2.Us[1]))
    # Same key -> same tensor (reproducibility preserved)
    t3 = tn.rand(4, 4, 4, 4, ranks_tt=3, key=jax.random.key(0))
    for a, b in zip(t.cores, t3.cores):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_pallas_tt_eval_f64_interpret():
    """The Pallas kernel must cast its f32 accumulator to the output dtype
    (f64 interpret mode is the CPU parity path)."""
    from tntorch_tpu.ops.pallas_tt import HAVE_PALLAS, pallas_tt_eval
    from tntorch_tpu.parallel.mesh import tt_batch_forward

    if not HAVE_PALLAS:
        return
    t = tn.randn(8, 9, 10, ranks_tt=4, key=jax.random.key(7))  # f64 cores
    X = jnp.asarray(np.random.default_rng(7).integers(0, 8, (128, 3)), dtype=jnp.int32)
    got = pallas_tt_eval(tuple(t.cores), X, interpret=True)
    ref = tt_batch_forward(list(t.cores), X)
    assert np.allclose(np.asarray(got), np.asarray(ref), atol=1e-6)


def test_shard_ranks_batch_tensor():
    from tntorch_tpu.parallel import make_mesh, shard_ranks, sharded_dot

    mesh = make_mesh((2, 4), ("dp", "tp"))
    t = tn.rand((4, 6, 6, 6), ranks_tt=4, batch=True, key=jax.random.key(8))
    ts = shard_ranks(t, mesh)  # must not crash / shard the batch axis
    d = sharded_dot(ts, ts)
    gt = np.sum(t.numpy() * t.numpy())
    assert np.isclose(float(np.sum(np.asarray(d))), gt, rtol=1e-10)


def test_tt_forward_shard_map_single_core():
    from tntorch_tpu.parallel import make_mesh
    from tntorch_tpu.parallel.mesh import tt_forward_shard_map

    mesh = make_mesh((4, 2), ("dp", "tp"))
    t = tn.rand([9], ranks_tt=None, key=jax.random.key(9))
    X = jnp.asarray(np.random.default_rng(9).integers(0, 9, (8, 1)), dtype=jnp.int32)
    y = tt_forward_shard_map(list(t.cores), X, mesh)
    gt = t.numpy()[np.asarray(X)[:, 0]]
    assert np.allclose(np.asarray(y), gt)


def test_ttmatrix_single_factor():
    rng = np.random.default_rng(10)
    A = rng.standard_normal((4, 4))
    A = A @ A.T + 4 * np.eye(4)  # SPD for cholesky
    m = tn.TTMatrix(jnp.asarray(A), [], [4], [4])
    assert np.allclose(np.asarray(m.full()), A, atol=1e-10)
    det = float(m.determinant())
    assert np.isclose(det, np.linalg.det(A), rtol=1e-8)
    inv = np.asarray(m.inv().full())
    assert np.allclose(inv, np.linalg.inv(A), atol=1e-8)


def test_orbax_roundtrip_frozen_us(tmp_path):
    t = tn.rand([6] * 3, ranks_tt=2, ranks_tucker=3, key=jax.random.key(11))
    t.set_factors("legendre")
    try:
        tn.save_orbax(t, tmp_path / "ck")
    except ImportError:
        return
    t2 = tn.load_orbax(tmp_path / "ck")
    assert t2.frozen_Us == {0, 1, 2}
    assert float(tn.relative_error(t, t2)) <= 1e-12


def test_truncated_svd_eig_complex():
    """algorithm='eig' must conjugate the Gram products: the reference's
    plain transpose fed eigh a non-Hermitian matrix for complex input."""
    rng = np.random.default_rng(12)
    A = (rng.standard_normal((8, 3)) + 1j * rng.standard_normal((8, 3))) @ (
        rng.standard_normal((3, 16)) + 1j * rng.standard_normal((3, 16))
    )
    for M in (jnp.asarray(A), jnp.asarray(A.T)):  # both Gram sides
        for lo in (True, False):
            u, v = tn.truncated_svd(M, rmax=3, algorithm="eig", left_ortho=lo)
            err = np.linalg.norm(np.asarray(u @ v) - np.asarray(M)) / np.linalg.norm(A)
            assert err < 1e-10, (M.shape, lo, err)


def test_truncated_svd_eig_rank_deficient_truncates():
    """The reference clamped zero eigenvalues to 1e-8, inflating them above
    tight error budgets so rank-deficient input was never truncated."""
    rng = np.random.default_rng(13)
    M = jnp.asarray(rng.standard_normal((10, 4)) @ rng.standard_normal((4, 20)))
    u, v = tn.truncated_svd(M, eps=1e-6, algorithm="eig")
    assert u.shape[1] == 4
    # Forcing the rank above the true rank must stay finite (guarded 1/sigma)
    u, v = tn.truncated_svd(M, rmax=8, algorithm="eig")
    assert np.isfinite(np.asarray(u)).all() and np.isfinite(np.asarray(v)).all()
    err = np.linalg.norm(np.asarray(u @ v) - np.asarray(M)) / np.linalg.norm(np.asarray(M))
    assert err < 1e-10


def test_record_samples_tensor_mode():
    """record_samples with K input tensors (K != N crashes in the reference:
    positions were sized (0, N) but stacked K fiber columns)."""
    t1 = tn.rand([5, 6, 7], ranks_tt=2, key=jax.random.key(14))
    t2 = tn.rand([5, 6, 7], ranks_tt=2, key=jax.random.key(15))
    out, info = tn.cross(
        tensors=[t1, t2], function=lambda a, b: a * b, verbose=False,
        record_samples=True, return_info=True, seed=0, fuse=False,
    )
    assert info["sample_positions"].shape[1] == 2
    assert info["sample_positions"].shape[0] == len(info["sample_values"])


def test_seed_is_process_wide():
    import threading

    tn.utils.seed(123)
    a = tn.rand([4, 4], ranks_tt=2)
    results = {}

    def worker():
        tn.utils.seed(123)
        results["t"] = tn.rand([4, 4], ranks_tt=2)

    th = threading.Thread(target=worker)
    th.start()
    th.join()
    assert np.array_equal(np.asarray(a.cores[0]), np.asarray(results["t"].cores[0]))


def test_optimize_clear_error_on_float_loss():
    """A loss that calls float() on a traced value cannot be differentiated
    by JAX at all (eager grad traces too); optimize must surface a clear
    ValueError instead of a raw tracer message (the old code only caught
    TracerArrayConversionError, so the sibling ConcretizationTypeError
    escaped with no guidance)."""
    import optax
    import pytest

    t = tn.rand([6, 6], ranks_tt=2, requires_grad=True, key=jax.random.key(16))
    target = jnp.asarray(np.random.default_rng(16).standard_normal((6, 6)))

    def loss(t):
        d = t.full() - target
        v = jnp.mean(d**2)
        if float(v) > 1e12:  # forces concretization under trace
            v = v * 1.0
        return v

    with pytest.raises(ValueError, match="Python scalar"):
        tn.optimize(t, loss, optimizer=optax.adam(1e-2), max_iter=5, tol=None,
                    verbose=False)


def test_setitem_batch_assignments():
    """Batch __setitem__: integer batch index, trailing int mode, and state
    preservation (review findings: batch axis dropped; unsqueeze slot off
    by one; requires_grad reset)."""
    rng = np.random.default_rng(40)
    x = rng.standard_normal((3, 4, 5))
    t = tn.Tensor(jnp.asarray(x), batch=True)
    v = rng.standard_normal((4, 5))
    t[1, :, :] = jnp.asarray(v)
    want = x.copy(); want[1] = v
    assert np.allclose(t.numpy(), want, atol=1e-9)

    t2 = tn.Tensor(jnp.asarray(x), batch=True)
    v2 = rng.standard_normal((3, 4))
    t2[:, :, 2] = jnp.asarray(v2)
    want2 = x.copy(); want2[:, :, 2] = v2
    assert np.allclose(t2.numpy(), want2, atol=1e-9)


def test_setitem_preserves_trainability():
    t = tn.rand([5, 6], ranks_tt=2, ranks_tucker=3, requires_grad=True,
                key=jax.random.key(41))
    t.set_factors("legendre")
    t[0, :] = 1.0
    assert t.requires_grad
    assert t.frozen_Us == {0, 1}


def test_setitem_duplicate_and_negative_indices():
    rng = np.random.default_rng(42)
    x = rng.standard_normal((4, 5, 6))
    t = tn.Tensor(jnp.asarray(x))
    v = rng.standard_normal((2, 5, 6))
    t[[1, 1]] = jnp.asarray(v)
    want = x.copy(); want[[1, 1]] = v  # numpy: last write wins
    assert np.allclose(t.numpy(), want, atol=1e-8)

    t2 = tn.Tensor(jnp.asarray(x))
    t2[-1] = 0.0
    want2 = x.copy(); want2[-1] = 0.0
    assert np.allclose(t2.numpy(), want2, atol=1e-9)


def test_getitem_batch_cp_scalar():
    """Full-integer indexing of a batch CP tensor returns per-sample scalars
    (the rank axis must be contracted — latent reference defect)."""
    rng = np.random.default_rng(43)
    fs = [jnp.asarray(rng.standard_normal((3, 6, 4))) for _ in range(3)]
    t = tn.Tensor(list(fs), batch=True)
    dense = t.numpy()
    got = t[2, 1, 2, 3]
    assert np.ndim(np.asarray(got)) == 0
    assert np.isclose(float(got), dense[2, 1, 2, 3])
    got2 = t[:, 1, 2, 3]
    assert np.asarray(got2).shape == (3,)
    assert np.allclose(np.asarray(got2), dense[:, 1, 2, 3])


def test_none_accessor_preserves_dtype():
    t = tn.rand([4, 5], ranks_tt=2, dtype=jnp.float32, key=jax.random.key(44))
    u = t[None, :, :]
    assert all(c.dtype == jnp.float32 for c in u.cores), [c.dtype for c in u.cores]


def test_pytree_arange_idxs_roundtrip():
    t = tn.rand([7, 8], ranks_tt=2, key=jax.random.key(45))
    leaves, treedef = jax.tree_util.tree_flatten(t)
    t2 = jax.tree_util.tree_unflatten(treedef, leaves)
    for a, b in zip(t.idxs, t2.idxs):
        assert np.array_equal(np.asarray(a), np.asarray(b))
    # masked (non-arange) idxs survive too
    t.idxs[0] = np.asarray([3, 1, 2, 0, 6, 5, 4])
    leaves, treedef = jax.tree_util.tree_flatten(t)
    t3 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert np.array_equal(t3.idxs[0], t.idxs[0])


def test_eq_inside_jit_clear_error():
    """Tensor == host-syncs to a Python bool (reference parity); under jit
    it must raise a clear message pointing at tn.dist, not a raw tracer
    error (VERDICT round-1 weak #8)."""
    import pytest

    t = tn.rand([4, 4], ranks_tt=2, key=jax.random.key(60))

    @jax.jit
    def f(cores):
        u = tn.Tensor(list(cores))
        return 1.0 if u == u else 0.0

    with pytest.raises(ValueError, match="tn.dist"):
        f(tuple(t.cores))
    # outside jit it still works
    assert t == t


def test_truncate_anova_batch_keepdim_false():
    """Batch truncate_anova(keepdim=False) must slice modes, not the batch
    axis (round-3 review: the slicing tuple omitted the leading batch axis,
    shifting every mode key by one)."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 5, 5, 5)))
    t = tn.Tensor(x, ranks_tt=8, batch=True)
    mask = tn.only(tn.symbols(3)[0])
    tr = tn.truncate_anova(t, mask, keepdim=False)
    assert tr.numpy().shape == (2, 5)
    for b in range(2):
        single = tn.Tensor(x[b], ranks_tt=8)
        ref = tn.truncate_anova(single, mask, keepdim=False)
        assert np.allclose(tr.numpy()[b], ref.numpy(), atol=1e-8)


def test_round_tucker_wide_cores_after_add():
    """round_tucker on rank-doubled (t+t) input hits 'wide' TT cores
    (Rl > I*Rr) near the right edge; the push-left reshape must use the
    reduced-QR width, not Rl (round-3 review crash)."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((6, 6, 6)))
    t = tn.Tensor(x, ranks_tt=6)
    s = t + t
    s.round_tucker(eps=1e-10)
    assert np.allclose(s.numpy(), 2 * x, atol=1e-8)
    # complex input rides the same jitted body
    xc = jnp.asarray(
        rng.standard_normal((6, 6, 6)) + 1j * rng.standard_normal((6, 6, 6))
    )
    tc = tn.Tensor(xc, ranks_tt=6)
    sc = tc + tc
    sc.round_tucker(eps=1e-10)
    assert np.allclose(sc.numpy(), 2 * xc, atol=1e-8)
    # batch variant
    xb = jnp.asarray(rng.standard_normal((2, 6, 6, 6)))
    tb = tn.Tensor(xb, ranks_tt=6, batch=True)
    sb = tb + tb
    sb.round_tucker(eps=1e-10)
    assert np.allclose(sb.numpy(), 2 * xb, atol=1e-8)


def test_sharded_checkpoint_roundtrips_idxs(tmp_path):
    """save_orbax_sharded/load_orbax_sharded must preserve t.idxs (round-3
    review: the sharded format silently dropped them, so mask/sobol on a
    restored anova tensor diverged)."""
    t = tn.rand([4, 4, 4], ranks_tt=3, key=jax.random.key(3))
    a = tn.anova_decomposition(t)
    p = tmp_path / "anova_ckpt"
    tn.save_orbax_sharded(a, p)
    b = tn.load_orbax_sharded(p)
    assert b.idxs is not None
    for ia, ib in zip(a.idxs, b.idxs):
        assert np.array_equal(np.asarray(ia), np.asarray(ib))
    m = tn.only(tn.symbols(3)[1])
    assert np.allclose(tn.mask(a, m).numpy(), tn.mask(b, m).numpy(), atol=1e-10)


def test_sharded_checkpoint_roundtrips_batch_idxs(tmp_path):
    """Batch tensors carry N+1 idxs (leading batch arange); the sharded
    loader must rebuild all of them, not truncate to N (round-3 review)."""
    t = tn.rand([4, 5, 6], ranks_tt=2, batch=True, key=jax.random.key(5))
    p = tmp_path / "batch_ckpt"
    tn.save_orbax_sharded(t, p)
    b = tn.load_orbax_sharded(p)
    assert len(b.idxs) == len(t.idxs) == 3
    for ia, ib in zip(t.idxs, b.idxs):
        assert np.array_equal(np.asarray(ia), np.asarray(ib))
    assert np.allclose(b.numpy(), t.numpy())


def test_round_tucker_eager_honors_dim():
    # The eager fallback (pre-existing Us) must truncate ONLY the requested
    # modes (the reference sweeps all modes regardless of dim — a defect)
    t = tn.rand((8, 8, 8), ranks_tt=4, ranks_tucker=6, key=jax.random.key(40))
    t.round_tucker(rmax=2, dim=[1])
    assert list(t.ranks_tucker) == [6, 2, 6]


def test_one_mode_cp_scalar_add():
    # (I, R) + (1, I, 1) numpy-broadcasts to R-fold inflation without the
    # column-sum lift
    t = tn.rand((5,), ranks_cp=3, key=jax.random.key(41))
    d = np.array(t.numpy())
    assert np.abs(np.array((t + 1.0).numpy()) - (d + 1.0)).max() <= 1e-12


def test_setitem_non_trailing_int_keys():
    t2 = tn.rand((5, 5), ranks_tt=2, key=jax.random.key(42))
    d2 = np.array(t2.numpy())
    t2[1] = np.zeros(5)
    d2[1] = 0
    assert np.allclose(np.array(t2.numpy()), d2)
    t3 = tn.rand((4, 5, 6), ranks_tt=2, key=jax.random.key(43))
    d3 = np.array(t3.numpy())
    t3[:, 2, :] = np.ones((4, 6))
    d3[:, 2, :] = 1
    assert np.allclose(np.array(t3.numpy()), d3)
    t4 = tn.rand((4, 5, 6), ranks_tt=2, key=jax.random.key(44))
    d4 = np.array(t4.numpy())
    t4[2, 3] = np.ones(6)
    d4[2, 3] = 1
    assert np.allclose(np.array(t4.numpy()), d4)


def test_setitem_cp_tensor():
    t = tn.rand((5, 5), ranks_cp=3, key=jax.random.key(45))
    d = np.array(t.numpy())
    t[1] = np.ones(5)
    d[1] = 1
    assert np.allclose(np.array(t.numpy()), d)


def test_setitem_np_integer_batch_key():
    t = tn.rand((3, 5, 5), ranks_tt=2, batch=True, key=jax.random.key(46))
    d = np.array(t.numpy())
    t[np.int64(0)] = np.ones((5, 5))
    d[0] = 1
    assert np.allclose(np.array(t.numpy()), d)


def test_round_combined_batch():
    t = tn.rand((3, 6, 6, 6), ranks_tt=4, batch=True, key=jax.random.key(47))
    d = np.array(t.numpy())
    tn.round(t, eps=1e-10)
    assert np.allclose(np.array(t.numpy()), d, atol=1e-8)


def test_batch_eq_and_scalar_mul_dtype():
    t = tn.rand((3, 6, 6), ranks_tt=2, batch=True, key=jax.random.key(48))
    assert (t == t) is True
    assert not (t == t * 2.0)
    t32 = tn.Tensor([
        jnp.asarray(np.random.rand(1, 4, 2), dtype=jnp.float32),
        jnp.asarray(np.random.rand(2, 4, 1), dtype=jnp.float32),
    ])
    assert (t32 * 2.0).cores[0].dtype == jnp.float32


def test_rpow_scalar_base():
    t = tn.rand((4, 4), ranks_tt=2, key=jax.random.key(49)) + 2
    r = 2.0 ** t
    assert np.allclose(np.array(r.numpy()), 2.0 ** np.array(t.numpy()), atol=1e-6)


def test_gram_init_with_tucker_ranks():
    # gram TT-stage + Tucker ranks must coexist (and keep the factors)
    data = jnp.asarray(np.random.default_rng(50).random((6, 6, 6)))
    t = tn.Tensor(data, ranks_tt=3, ranks_tucker=4, algorithm="gram")
    assert list(t.ranks_tucker) == [4, 4, 4]
    assert list(t.ranks_tt) == [1, 3, 3, 1]
