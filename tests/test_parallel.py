"""Multi-device sharding tests on the virtual 8-device CPU mesh
(the distributed story the reference lacks; SURVEY.md section 2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tntorch_tpu as tn
from tntorch_tpu.parallel import (
    make_mesh, replicate, shard_batch, shard_ranks, sharded_dot, sharded_norm,
    tt_forward_sharded,
)

needs_8 = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")


@needs_8
def test_sharded_dot_matches():
    mesh = make_mesh((4, 2), ("dp", "tp"))
    a = tn.randn(8, 8, 8, 8, ranks_tt=4)
    b = tn.randn(8, 8, 8, 8, ranks_tt=4)
    gt = float(tn.dot(a, b))
    assert abs(float(sharded_dot(shard_ranks(a, mesh), shard_ranks(b, mesh))) - gt) <= 1e-8
    assert abs(float(sharded_norm(shard_ranks(a, mesh))) - float(tn.norm(a))) <= 1e-8
    assert abs(float(sharded_dot(replicate(a, mesh), replicate(b, mesh))) - gt) <= 1e-8


@needs_8
def test_shard_batch_roundtrip():
    mesh = make_mesh((4, 2), ("dp", "tp"))
    tb = tn.randn(16, 5, 5, 5, ranks_tt=3, batch=True)
    tbs = shard_batch(tb, mesh)
    assert np.allclose(tbs.numpy(), tb.numpy())
    # arithmetic on sharded batch tensors still works
    s = tbs + tbs
    assert np.allclose(s.numpy(), 2 * tb.numpy())


@needs_8
def test_tt_forward_sharded():
    mesh = make_mesh((4, 2), ("dp", "tp"))
    a = tn.randn(8, 8, 8, 8, ranks_tt=4)
    X = jnp.asarray(np.random.default_rng(0).integers(0, 8, (64, 4)), dtype=jnp.int32)
    y = tt_forward_sharded(list(a.cores), X, mesh)
    gt = a.numpy()[tuple(np.asarray(X).T)]
    assert np.allclose(np.asarray(y), gt, atol=1e-8)


@needs_8
def test_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
    ge.dryrun_multichip(3)


@needs_8
def test_dryrun_multichip_hermetic_subprocess():
    """Regression for round-1 MULTICHIP fail: when the live process cannot
    provide the requested CPU devices (here: 16 > 8, standing in for 'a
    foreign platform is the default backend'), the dryrun must re-exec a
    hermetic CPU-pinned subprocess rather than touch the default backend."""
    import __graft_entry__ as ge

    assert not ge._cpu_ready_in_process(16)
    ge.dryrun_multichip(16)


def test_entry_forward():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (256,)
    assert np.isfinite(np.asarray(out)).all()


@needs_8
def test_fiber_parallel_cross():
    import jax.numpy as jnp

    mesh = make_mesh((8,), ("dp",))
    domain = [jnp.linspace(1, 16, 16)] * 4
    h = tn.cross(
        function=lambda a, b, c, d: 1.0 / (a + b + c + d),
        domain=domain, eps=1e-6, verbose=False, seed=0, mesh=mesh,
    )
    gt = 1.0 / sum(jnp.meshgrid(*domain, indexing="ij"))
    assert float(tn.relative_error(tn.Tensor(gt), h)) <= 1e-6


@needs_8
def test_tt_forward_shard_map():
    from tntorch_tpu.parallel import tt_forward_shard_map
    from tntorch_tpu.parallel.mesh import tt_batch_forward

    mesh = make_mesh((4, 2), ("dp", "tp"))
    for N in (4, 5):
        t = tn.randn(*([8] * N), ranks_tt=4)
        X = jnp.asarray(np.random.default_rng(0).integers(0, 8, (64, N)), dtype=jnp.int32)
        gt = tt_batch_forward(list(t.cores), X)
        y = tt_forward_shard_map(list(t.cores), X, mesh)
        assert float(jnp.abs(y - gt).max()) <= 1e-10


# ---------------------------------------------------------------------------
# Distributed heavy algorithms (round-2: VERDICT item 3)
# ---------------------------------------------------------------------------

@needs_8
def test_round_tt_gram_sharded_matches_single_device():
    from tntorch_tpu.ops.rounding import round_tt_gram
    from tntorch_tpu.parallel import round_tt_gram_sharded

    rng = np.random.default_rng(3)
    for shape, tp in [((8, 8, 8, 8), 4), ((6, 10, 7), 2)]:  # incl. non-divisible modes
        mesh = make_mesh((8 // tp, tp), ("dp", "tp"))
        N = len(shape)
        ranks = [1] + [6] * (N - 1) + [1]
        cores = [
            jnp.asarray(rng.standard_normal((ranks[n], shape[n], ranks[n + 1])))
            for n in range(N)
        ]
        ref = round_tt_gram(tuple(cores), 3)
        out = round_tt_gram_sharded(cores, 3, mesh, axis="tp")
        from tntorch_tpu.ops.rounding import tt_full

        assert np.allclose(
            np.asarray(tt_full(tuple(out))), np.asarray(tt_full(tuple(ref))), atol=1e-12
        )


@needs_8
def test_round_tt_gram_sharded_per_edge_ranks():
    from tntorch_tpu.ops.rounding import round_tt_gram, tt_full
    from tntorch_tpu.parallel import round_tt_gram_sharded

    rng = np.random.default_rng(4)
    mesh = make_mesh((2, 4), ("dp", "tp"))
    ranks = [1, 5, 5, 1]
    cores = [
        jnp.asarray(rng.standard_normal((ranks[n], 8, ranks[n + 1]))) for n in range(3)
    ]
    rmax = (2, 3)
    ref = round_tt_gram(tuple(cores), rmax)
    out = round_tt_gram_sharded(cores, rmax, mesh, axis="tp")
    assert [c.shape for c in out] == [c.shape for c in ref]
    assert np.allclose(np.asarray(tt_full(tuple(out))), np.asarray(tt_full(tuple(ref))), atol=1e-12)


@needs_8
def test_round_tt_batch_sharded_matches():
    from tntorch_tpu.ops.rounding import round_tt_gram
    from tntorch_tpu.parallel import round_tt_batch_sharded

    rng = np.random.default_rng(5)
    mesh = make_mesh((8, 1), ("dp", "tp"))
    B, N, I, R = 16, 3, 6, 5
    ranks = [1] + [R] * (N - 1) + [1]
    bcores = [
        jnp.asarray(rng.standard_normal((B, ranks[n], I, ranks[n + 1])))
        for n in range(N)
    ]
    out = round_tt_batch_sharded(bcores, 3, mesh, axis="dp")
    for b in range(B):
        ref = round_tt_gram(tuple(c[b] for c in bcores), 3)
        for co, cr in zip(out, ref):
            assert np.allclose(np.asarray(co[b]), np.asarray(cr), atol=1e-12)


@needs_8
def test_optimize_mesh_dp_matches_single_device():
    """dp-sharded optimize: replicated params + dp-sharded data must produce
    the same loss history as the unsharded run (f64, same seed)."""
    import optax

    from tntorch_tpu.parallel import shard_array

    mesh = make_mesh((8, 1), ("dp", "tp"))
    rng = np.random.default_rng(0)
    N, I, R, B = 3, 6, 4, 64
    X_np = rng.integers(0, I, (B, N)).astype(np.int32)
    y_np = rng.standard_normal(B)

    def make_t():
        tn.utils.seed(7)
        t = tn.rand([I] * N, ranks_tt=R, requires_grad=True)
        return t

    def run(mesh_arg, X, y):
        t = make_t()

        def loss(t_):
            pred = tn.parallel.tt_batch_forward(list(t_.cores), X)
            return jnp.mean((pred - y) ** 2)

        hist = tn.optimize(
            t, loss, optimizer=optax.adam(1e-2), max_iter=30, tol=None,
            verbose=False, mesh=mesh_arg,
        )
        return hist, t

    hist0, t0 = run(None, jnp.asarray(X_np), jnp.asarray(y_np))
    hist1, t1 = run(mesh, shard_array(X_np, mesh), shard_array(y_np, mesh))
    assert np.allclose(hist0, hist1, atol=1e-12)
    for c0, c1 in zip(t0.cores, t1.cores):
        assert np.allclose(np.asarray(c0), np.asarray(c1), atol=1e-12)


@needs_8
def test_als_completion_mesh_matches_single_device():
    rng = np.random.default_rng(2)
    mesh = make_mesh((8, 1), ("dp", "tp"))
    N, I, R, P = 3, 12, 3, 1500
    gt = tn.rand([I] * N, ranks_tt=R)
    X = rng.integers(0, I, (P, N))
    for n in range(N):
        X[:I, n] = np.arange(I)
    yv = jnp.asarray(gt.numpy()[tuple(X.T)])
    tn.utils.seed(11)
    r0 = tn.als_completion(X, yv, ranks_tt=R, shape=[I] * N, niter=6, verbose=False)
    tn.utils.seed(11)
    r1 = tn.als_completion(
        X, yv, ranks_tt=R, shape=[I] * N, niter=6, verbose=False, mesh=mesh
    )
    assert np.allclose(r0.numpy(), r1.numpy(), atol=1e-10)
    err = np.linalg.norm(r1.numpy() - gt.numpy()) / np.linalg.norm(gt.numpy())
    assert err < 1e-2


@needs_8
def test_round_tt_gram_sharded_rand_solver():
    """edge_solver='rand' under shard_map: the subspace iteration runs on
    replicated psum'd Grams, so sharded output matches the single-device
    rand kernel (same fixed sketch) and recovers rank-deficient input."""
    from tntorch_tpu.ops.rounding import round_tt_gram, tt_full
    from tntorch_tpu.parallel import round_tt_gram_sharded

    mesh = make_mesh((2, 4), ("dp", "tp"))
    a = tn.randn(8, 8, 8, ranks_tt=3, key=jax.random.key(5))
    b = a + a  # exact rank 3 at doubled representation rank
    ref = round_tt_gram(tuple(b.cores), 3, edge_solver="rand")
    out = round_tt_gram_sharded(list(b.cores), 3, mesh, axis="tp", edge_solver="rand")
    assert np.allclose(
        np.asarray(tt_full(tuple(out))), np.asarray(tt_full(tuple(ref))), atol=1e-10
    )
    err = float(
        np.linalg.norm(np.asarray(tt_full(tuple(out))) - 2 * np.asarray(a.full()))
        / np.linalg.norm(2 * np.asarray(a.full()))
    )
    assert err <= 1e-9


def test_hybrid_dcn_mesh():
    """make_mesh(dcn_shape=): slice-major hybrid layout (VERDICT r2 #6). On
    the virtual CPU mesh the fallback groups contiguous device blocks into
    slices; the dp axis spans slices x chips and collectives still work."""
    mesh = make_mesh((2, 2), ("dp", "tp"), dcn_shape=(2, 1))
    assert mesh.shape["dp"] == 4 and mesh.shape["tp"] == 2
    # slice-major along dp: rows 0-1 come from the first contiguous block
    ids = np.vectorize(lambda d: d.id)(mesh.devices)
    assert set(ids[:2].ravel()) == set(range(4))
    t = tn.rand((6, 6, 6), ranks_tt=4, key=jax.random.key(0))
    d = sharded_dot(shard_ranks(t, mesh), shard_ranks(t, mesh))
    assert np.isfinite(float(d))


def test_sharded_orbax_roundtrip(tmp_path):
    """save_orbax_sharded preserves NamedSharding layouts: a dp-sharded
    batch tensor restores onto the mesh with the same spec and values
    (VERDICT r2 #7)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_mesh((8, 1), ("dp", "tp"))
    t = tn.rand((8, 5, 6), ranks_tt=3, batch=True, key=jax.random.key(1))
    ts = shard_batch(t, mesh)
    p = tmp_path / "sharded_ckpt"
    tn.save_orbax_sharded(ts, p)
    back = tn.load_orbax_sharded(p, mesh=mesh)
    assert back.batch
    for c0, c1 in zip(ts.cores, back.cores):
        assert isinstance(c1.sharding, NamedSharding)
        assert c1.sharding.spec == c0.sharding.spec
        np.testing.assert_allclose(np.asarray(c1), np.asarray(c0), atol=1e-12)
    # unsharded restore works without a mesh
    flat = tn.load_orbax_sharded(p)
    np.testing.assert_allclose(
        np.asarray(flat.numpy()), np.asarray(t.numpy()), atol=1e-12
    )


def test_learner_ensemble_mesh_matches_single_device():
    """TTRegressor ensemble with mesh=: members dp-sharded across devices,
    params replicated — must match the unsharded fit (same global math)."""
    rng = np.random.default_rng(21)
    X = rng.uniform(-1, 1, (96, 2))
    y = np.sin(2 * X[:, 0]) + X[:, 1]
    mesh = make_mesh((8,), ("dp",))
    kw = dict(nticks=16, ranks_tt=3, ranks_tucker=4, max_iter=150, tol=1e-12,
              n_estimators=8, verbose=False)
    a = tn.TTRegressor(key=jax.random.key(3), **kw).fit(X, y)
    b = tn.TTRegressor(key=jax.random.key(3), mesh=mesh, **kw).fit(X, y)
    Xt = rng.uniform(-1, 1, (30, 2))
    np.testing.assert_allclose(
        np.asarray(a.predict(Xt)), np.asarray(b.predict(Xt)), rtol=1e-6, atol=1e-9
    )
    # single-model data-parallel path: samples sharded over dp
    c = tn.TTRegressor(key=jax.random.key(3), nticks=16, ranks_tt=3,
                       ranks_tucker=4, max_iter=150, tol=1e-12, verbose=False).fit(X, y)
    d = tn.TTRegressor(key=jax.random.key(3), mesh=mesh, nticks=16, ranks_tt=3,
                       ranks_tucker=4, max_iter=150, tol=1e-12, verbose=False).fit(X, y)
    np.testing.assert_allclose(
        np.asarray(c.predict(Xt)), np.asarray(d.predict(Xt)), rtol=1e-6, atol=1e-9
    )


def test_shard_map_forward_odd_edge_not_divisible():
    """Only EVEN rank edges are split by the alternating tp layout; an odd
    edge whose rank does not divide tp must still evaluate (round-3 review:
    a spurious assert rejected it)."""
    from tntorch_tpu.parallel.mesh import tt_batch_forward, tt_forward_shard_map

    mesh = make_mesh((4, 2))
    rng = np.random.default_rng(0)
    cores = [
        jnp.asarray(rng.standard_normal(s))
        for s in [(1, 5, 8), (8, 5, 3), (3, 5, 8), (8, 5, 1)]
    ]
    X = jnp.asarray(rng.integers(0, 5, (16, 4)), dtype=jnp.int32)
    out = tt_forward_shard_map(cores, X, mesh)
    ref = tt_batch_forward(cores, X)
    assert np.allclose(np.asarray(out), np.asarray(ref), atol=1e-10)


def test_sharded_rounding_wrappers_cached():
    """round_tt_gram_sharded must reuse its jitted shard_map program across
    calls (round-3 review: per-call wrappers retraced every invocation)."""
    from tntorch_tpu.parallel.algorithms import (
        _gram_round_sharded_jit,
        round_tt_gram_sharded,
    )

    mesh = make_mesh((4, 2))
    rng = np.random.default_rng(2)
    cs = [
        jnp.asarray(rng.standard_normal((1 if n == 0 else 4, 8, 1 if n == 2 else 4)))
        for n in range(3)
    ]
    before = _gram_round_sharded_jit.cache_info().hits
    round_tt_gram_sharded(cs, 2, mesh)
    round_tt_gram_sharded(cs, 2, mesh)
    assert _gram_round_sharded_jit.cache_info().hits > before


def _collective_ops(hlo_text):
    """Parse HLO text for collective op definitions: returns a list of
    (op_kind, [element_counts per output component])."""
    import re

    out = []
    for line in hlo_text.splitlines():
        m = re.search(
            r"=\s*(.*?)\s+(all-reduce|all-gather|reduce-scatter|all-to-all|"
            r"collective-permute)(-start)?\(", line)
        if not m:
            continue
        shapes = re.findall(r"\[([0-9,]*)\]", m.group(1))
        counts = []
        for s in shapes:
            dims = [int(d) for d in s.split(",") if d != ""]
            counts.append(int(np.prod(dims)) if dims else 1)
        out.append((m.group(2), counts))
    return out


def test_round_sharded_collective_invariant():
    """VERDICT r4 next #6: the communication claim for mode-sharded Gram
    rounding (2(N-1) all-reduces, every one an R x R matrix) is asserted at
    the HLO level — a code change that introduces extra or fatter
    collectives (e.g. an all-gather of a core) fails here."""
    from tntorch_tpu.parallel.algorithms import _gram_round_sharded_jit

    mesh = make_mesh((8,), ("tp",))
    N, I, R, rmax = 4, 16, 8, 4
    cores = tuple(
        jnp.ones((1 if n == 0 else R, I, 1 if n == N - 1 else R))
        for n in range(N)
    )
    run = _gram_round_sharded_jit(mesh, "tp", rmax, "eigh", N)
    hlo = run.lower(cores).compile().as_text()
    ops = _collective_ops(hlo)
    assert ops, "expected collectives in the sharded rounding program"
    # Only all-reduces (psums of Gram matrices); nothing else ever
    kinds = {k for k, _ in ops}
    assert kinds <= {"all-reduce"}, kinds
    # At most one psum per Gram edge per chain = 2(N-1) (XLA's combiner may
    # merge some into tuple all-reduces — fewer is fine, more is a bug)
    assert len(ops) <= 2 * (N - 1), ops
    # Every all-reduced component is at most R x R — a fatter operand means
    # a collective moved off the rank edges onto mode data
    for kind, counts in ops:
        for c in counts:
            assert c <= R * R, (kind, counts)


def test_sharded_dot_collective_invariant():
    """sharded_dot on rank-sharded operands: XLA may all-gather the small
    cores or psum the rank partials, but no collective may move more than
    one core's worth of data, and the count stays O(N)."""
    mesh = make_mesh((8,), ("tp",))
    N, I, R = 4, 16, 8
    t1 = tn.rand((I,) * N, ranks_tt=R, key=jax.random.key(0))
    t2 = tn.rand((I,) * N, ranks_tt=R, key=jax.random.key(1))
    s1 = shard_ranks(t1, mesh)
    s2 = shard_ranks(t2, mesh)
    from tntorch_tpu.parallel.mesh import _dot_jit

    hlo = _dot_jit.lower(s1, s2).compile().as_text()
    ops = _collective_ops(hlo)
    core_elems = R * I * R
    assert len(ops) <= 2 * N, ops
    for kind, counts in ops:
        for c in counts:
            assert c <= core_elems, (kind, counts)
