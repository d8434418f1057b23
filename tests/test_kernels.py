"""Jitted/Pallas kernel tests (ops/rounding.py, ops/pallas_tt.py)."""

import jax
import jax.numpy as jnp
import numpy as np

import tntorch_tpu as tn
from tntorch_tpu.ops.pallas_tt import pallas_tt_eval
from tntorch_tpu.ops.rounding import round_tt_fixed, round_tt_gram, tt_dot, tt_full
from tntorch_tpu.parallel.mesh import tt_batch_forward

np.random.seed(13)


def test_round_kernels_exact_recovery():
    a = tn.randn(12, 13, 14, 15, ranks_tt=4, key=jax.random.key(0))
    b = a + a
    cores = tuple(jnp.asarray(c) for c in b.cores)
    dense = 2 * a.full()
    for fn in (round_tt_fixed, round_tt_gram):
        out = fn(cores, 4)
        assert [c.shape for c in out] == [(1, 12, 4), (4, 13, 4), (4, 14, 4), (4, 15, 1)]
        err = float(jnp.linalg.norm(tt_full(list(out)) - dense) / jnp.linalg.norm(dense))
        assert err <= 1e-10


def test_tt_dot_full():
    a = tn.randn(6, 7, 8, ranks_tt=3)
    b = tn.randn(6, 7, 8, ranks_tt=2)
    assert abs(float(tt_dot(tuple(a.cores), tuple(b.cores))) - float(tn.dot(a, b))) <= 1e-10
    assert np.allclose(tt_full(list(a.cores)), a.full())


def test_pallas_tt_eval_interpret():
    t = tn.randn(8, 9, 10, 11, ranks_tt=5, dtype=jnp.float32)
    cores = tuple(c.astype(jnp.float32) for c in t.cores)
    rng = np.random.default_rng(0)
    X = jnp.asarray(
        np.stack([rng.integers(0, s, 256) for s in t.shape], axis=1), dtype=jnp.int32
    )
    gt = tt_batch_forward(list(cores), X)
    out = pallas_tt_eval(cores, X, interpret=True)
    assert float(jnp.linalg.norm(out - gt) / jnp.linalg.norm(gt)) <= 1e-5


def test_tt_eval_dispatch():
    t = tn.randn(5, 6, 7, ranks_tt=3)
    rng = np.random.default_rng(1)
    X = jnp.asarray(np.stack([rng.integers(0, s, 64) for s in t.shape], axis=1), dtype=jnp.int32)
    out = tn.tt_eval(t.cores, X)  # CPU -> XLA path
    gt = np.asarray(t.full())[tuple(np.asarray(X).T)]
    assert np.allclose(out, gt, atol=1e-10)


def test_tt_svd_kernels():
    from tntorch_tpu.ops.decomposition import tt_svd_gram, tt_svd_randomized

    rng = np.random.default_rng(3)
    # Low-rank ground truth: exact recovery at the true rank
    gt = tn.randn(10, 11, 12, 13, ranks_tt=3, key=jax.random.key(2))
    data = gt.full()
    for alg in ("gram", "randomized"):
        t = tn.Tensor(data, ranks_tt=3, algorithm=alg)
        assert float(tn.relative_error(gt, t)) <= 1e-6, alg
    # kernel API directly
    cores = tt_svd_gram(data, 3)
    assert [c.shape for c in cores] == [(1, 10, 3), (3, 11, 3), (3, 12, 3), (3, 13, 1)]
    cores = tt_svd_randomized(data, 3, key=jax.random.key(0))
    assert [c.shape for c in cores] == [(1, 10, 3), (3, 11, 3), (3, 12, 3), (3, 13, 1)]


def test_tt_svd_gram_batch():
    xb = np.random.rand(3, 8, 9, 10)
    tb = tn.Tensor(jnp.asarray(xb), ranks_tt=4, algorithm="gram", batch=True)
    for i in range(3):
        ti = tn.Tensor(jnp.asarray(xb[i]), ranks_tt=4, algorithm="gram")
        assert float(jnp.abs(tb.full()[i] - ti.full()).max()) <= 1e-10


def test_round_gram_rand_exact_recovery():
    """edge_solver='rand' (randomized subspace iteration, no eigh): exact on
    rank-deficient input (t+t back to the true rank) in f64."""
    a = tn.randn(12, 13, 14, 15, ranks_tt=4, key=jax.random.key(1))
    b = a + a
    cores = tuple(jnp.asarray(c) for c in b.cores)
    dense = 2 * a.full()
    out = round_tt_gram(cores, 4, edge_solver="rand")
    assert [c.shape for c in out] == [(1, 12, 4), (4, 13, 4), (4, 14, 4), (4, 15, 1)]
    err = float(jnp.linalg.norm(tt_full(list(out)) - dense) / jnp.linalg.norm(dense))
    assert err <= 1e-9


def test_round_gram_rand_quasi_optimal():
    """On a flat-spectrum random TT (hardest case for subspace iteration),
    the randomized truncation error stays within a few percent of the
    optimal (eigh) truncation; the API path is round_tt(algorithm='randgram')."""
    t = tn.randn(10, 11, 12, 13, ranks_tt=16, key=jax.random.key(2))
    dense = t.full()

    t1 = t.clone()
    t1.round_tt(rmax=8, algorithm="gram")
    e_opt = float(jnp.linalg.norm(t1.full() - dense) / jnp.linalg.norm(dense))

    t2 = t.clone()
    t2.round_tt(rmax=8, algorithm="randgram")
    assert [int(r) for r in t2.ranks_tt[1:-1]] == [8, 8, 8]
    e_rand = float(jnp.linalg.norm(t2.full() - dense) / jnp.linalg.norm(dense))
    assert e_rand <= e_opt * 1.1 + 1e-12, (e_rand, e_opt)


def test_pallas_gram_edges_interpret():
    """Fused Pallas Gram-chain edges (interpret mode) match the einsum pair."""
    from tntorch_tpu.ops.pallas_gram import HAVE_PALLAS, pallas_gram_edge

    if not HAVE_PALLAS:
        return
    rng = np.random.default_rng(21)
    B, Rl, I, Rr = 2, 16, 48, 8
    C = jnp.asarray(rng.standard_normal((B, Rl, I, Rr)), dtype=jnp.float32)
    G = jnp.asarray(rng.standard_normal((B, Rr, Rr)), dtype=jnp.float32)
    want = jnp.einsum("zaic,zdic->zad", jnp.einsum("zaib,zbc->zaic", C, G), C)
    got = pallas_gram_edge(C, G, interpret=True)
    assert float(jnp.abs(got - want).max()) <= 1e-4 * float(jnp.abs(want).max())
    # (the LEFT Gram edge needs no fused kernel anymore: with the identity
    # L-weighting removed it is a single contiguous SYRK GEMM)


def test_pallas_wgram_proj2_interpret():
    """The weighted left-Gram and double-sided projection kernels of the
    no-push batched sweep (interpret mode) match their einsum oracles."""
    from tntorch_tpu.ops.pallas_gram import (
        HAVE_PALLAS, pallas_proj2, pallas_wgram, proj2_supported, wgram_supported,
    )

    if not HAVE_PALLAS:
        return
    rng = np.random.default_rng(23)
    B, Rl, I, Rr = 2, 16, 32, 128
    C = jnp.asarray(rng.standard_normal((B, Rl, I, Rr)), dtype=jnp.float32)
    W = jnp.asarray(rng.standard_normal((B, Rl, Rl)), dtype=jnp.float32)
    W = W @ jnp.swapaxes(W, -1, -2)
    assert wgram_supported(C)
    got = pallas_wgram(C, W, interpret=True)
    want = jnp.einsum("zaib,zad,zdic->zbc", C, W, C)
    assert float(jnp.abs(got - want).max()) <= 1e-4 * float(jnp.abs(want).max())

    Y = jnp.asarray(rng.standard_normal((B, 8, Rl)), dtype=jnp.float32)
    # r2=24 exercises the 128-lane zero-pad + slice-back path
    X = jnp.asarray(rng.standard_normal((B, Rr, 24)), dtype=jnp.float32)
    assert proj2_supported(Y, C, X)
    got2 = pallas_proj2(Y, C, X, interpret=True)
    want2 = jnp.einsum("zra,zaib,zbc->zric", Y, C, X)
    assert float(jnp.abs(got2 - want2).max()) <= 1e-4 * float(jnp.abs(want2).max())


def test_round_tt_gram_batched_nopush_matches_push():
    """The no-push sweep (deferred interface transforms + fused wgram/proj2
    kernels, interpret mode) reproduces the eager-push sweep on shapes that
    qualify (every middle edge 128-lane aligned), for both edge solvers."""
    from tntorch_tpu.ops.rounding import round_tt_gram_batched, tt_full

    B, N, I, R, rmax = 2, 4, 16, 128, 64
    rng = np.random.default_rng(24)
    ranks = [1] + [R] * (N - 1) + [1]
    bcores = tuple(
        jnp.asarray(
            rng.standard_normal((B, ranks[n], I, ranks[n + 1])) / 12.0,
            dtype=jnp.float32,
        )
        for n in range(N)
    )
    fullb = jax.vmap(tt_full)
    for solver in ("eigh", "rand"):
        push = round_tt_gram_batched(bcores, rmax, solver, False, "highest")
        nopush = round_tt_gram_batched(bcores, rmax, solver, True, "highest", True)
        assert [c.shape for c in push] == [c.shape for c in nopush]
        d_push, d_nopush = fullb(push), fullb(nopush)
        rel = float(
            jnp.linalg.norm(d_nopush - d_push) / jnp.linalg.norm(d_push)
        )
        assert rel < 1e-4, (solver, rel)


def test_round_tt_gram_batched_matches_vmap():
    """The natively-batched rounding body (einsum path) is bit-identical to
    vmapping the per-sample body, for both edge solvers."""
    from tntorch_tpu.ops.rounding import _round_tt_gram_body, round_tt_gram_batched

    B, N, I, R, rmax = 3, 4, 12, 8, 4
    rng = np.random.default_rng(22)
    ranks = [1] + [R] * (N - 1) + [1]
    bcores = tuple(
        jnp.asarray(rng.standard_normal((B, ranks[n], I, ranks[n + 1])))
        for n in range(N)
    )

    def full(cs):
        f = cs[0].reshape(B, -1, cs[0].shape[-1])
        for c in cs[1:]:
            f = jnp.einsum("zpr,zriq->zpiq", f, c).reshape(B, -1, c.shape[-1])
        return f

    for solver in ("eigh", "rand"):
        ref = jax.vmap(
            lambda *cs: tuple(_round_tt_gram_body(list(cs), rmax, edge_solver=solver))
        )(*bcores)
        got = round_tt_gram_batched(bcores, rmax, solver, False)
        diff = float(jnp.abs(full([jnp.asarray(c) for c in ref]) - full(list(got))).max())
        assert diff <= 1e-10, (solver, diff)


def test_rect_maxvol_device_matches_host():
    """Device-resident greedy rect_maxvol (lax.while_loop, static maxK) picks
    the same rows as the host implementation (VERDICT r2 missing #1)."""
    from tntorch_tpu.maxvol import rect_maxvol, rect_maxvol_device

    rng = np.random.default_rng(3)
    for n, r, maxK in [(200, 8, 20), (50, 5, 5), (64, 10, 64), (40, 12, 40)]:
        A = rng.standard_normal((n, r))
        ih, Ch = rect_maxvol(A, maxK=maxK)
        idv, Cd = rect_maxvol_device(A, maxK=maxK)
        assert len(ih) == len(idv)
        assert set(int(i) for i in ih) == set(int(i) for i in np.asarray(idv))
        # identity-submatrix property of the coefficients
        np.testing.assert_allclose(
            np.asarray(Cd)[np.asarray(idv)], np.eye(len(idv)), atol=1e-10
        )


def test_round_tt_fixed_complex():
    # The QR-path fixed-rank kernel must build a HERMITIAN Gram for complex
    # cores (round-3 review: M @ M.T picked a wrong subspace, 0.68 rel err)
    from tntorch_tpu.ops.rounding import round_tt_fixed, tt_full

    rng = np.random.default_rng(5)
    cores = [
        rng.standard_normal((1, 6, 2)) + 1j * rng.standard_normal((1, 6, 2)),
        rng.standard_normal((2, 6, 2)) + 1j * rng.standard_normal((2, 6, 2)),
        rng.standard_normal((2, 6, 1)) + 1j * rng.standard_normal((2, 6, 1)),
    ]

    def padc(c, rl, rr):
        z = np.zeros((rl, c.shape[1], rr), dtype=c.dtype)
        z[: c.shape[0], :, : c.shape[2]] = c
        return z

    padded = [padc(cores[0], 1, 3), padc(cores[1], 3, 3), padc(cores[2], 3, 1)]
    out = round_tt_fixed(tuple(jnp.asarray(c) for c in padded), 2)
    ref = np.asarray(tt_full(tuple(jnp.asarray(c) for c in cores)))
    err = np.linalg.norm(np.asarray(tt_full(tuple(out))) - ref) / np.linalg.norm(ref)
    assert err <= 1e-12


def test_round_tt_gram_accepts_rank_list():
    from tntorch_tpu.ops.rounding import round_tt_gram

    rng = np.random.default_rng(6)
    cores = [
        jnp.asarray(rng.standard_normal((1, 8, 6))),
        jnp.asarray(rng.standard_normal((6, 8, 6))),
        jnp.asarray(rng.standard_normal((6, 8, 1))),
    ]
    out = round_tt_gram(cores, [4, 5])
    assert [c.shape for c in out] == [(1, 8, 4), (4, 8, 5), (5, 8, 1)]


def test_tt_svd_rank_list_monotone_cap():
    # Per-mode rmax lists must respect the chain cap r_k <= r_{k-1} * I_{k-1}
    # (round-3 review: [1, 32] on a (2,2,64) array crashed in a reshape)
    rng = np.random.default_rng(0)
    data = jnp.asarray(rng.standard_normal((2, 2, 64)))
    for algo in ["gram", "randomized"]:
        t = tn.Tensor(data, ranks_tt=[1, 32], algorithm=algo)
        assert list(t.ranks_tt)[1] == 1 and list(t.ranks_tt)[2] <= 2


def test_device_lu_pivots_rank_deficient_chunked():
    # Tournament pivoting on a chunked rank-deficient tall matrix must not
    # return padded-row indices (which clamp to duplicates)
    from tntorch_tpu.maxvol import _device_lu_pivots

    rng = np.random.default_rng(1)
    A = np.zeros((300000, 4))
    A[:3] = rng.standard_normal((3, 4))
    piv = np.asarray(_device_lu_pivots(jnp.asarray(A)))
    assert (piv < 300000).all()
    assert len(set(piv.tolist())) == 4


def test_round_tt_gram_complex():
    # The Gram kernels are complex-safe (Hermitian Grams, F/F^{-H} pair,
    # conjugated projections); previously complex was gated out entirely
    from tntorch_tpu.ops.rounding import round_tt_gram, round_tt_gram_batched, tt_full

    rng = np.random.default_rng(7)

    def randc(shape):
        return jnp.asarray(rng.standard_normal(shape) + 1j * rng.standard_normal(shape))

    base = [randc((1, 8, 2)), randc((2, 8, 2)), randc((2, 8, 1))]

    def pad(c, rl, rr):
        z = np.zeros((rl, c.shape[1], rr), dtype=np.asarray(c).dtype)
        z[: c.shape[0], :, : c.shape[2]] = c
        return jnp.asarray(z)

    padded = [pad(base[0], 1, 4), pad(base[1], 4, 4), pad(base[2], 4, 1)]
    ref = np.asarray(tt_full(tuple(base)))
    for solver in ["eigh", "rand"]:
        out = round_tt_gram(padded, 2, edge_solver=solver)
        err = np.linalg.norm(np.asarray(tt_full(tuple(out))) - ref) / np.linalg.norm(ref)
        assert err <= 1e-9, (solver, err)

    # Public API admits complex gram now
    t = tn.Tensor(list(padded))
    t.round_tt(rmax=2, algorithm="gram")
    assert np.linalg.norm(np.array(t.numpy()) - ref) / np.linalg.norm(ref) <= 1e-9

    # Natively-batched body
    bcores = tuple(jnp.stack([c, 1.5 * c]) for c in padded)
    outb = round_tt_gram_batched(bcores, 2, "eigh", False)
    got0 = np.asarray(tt_full(tuple(c[0] for c in outb)))
    assert np.linalg.norm(got0 - ref) / np.linalg.norm(ref) <= 1e-9


def test_compilation_cache_writes_are_atomic(tmp_path):
    """jax's LRUCache.put is patched to tmp-write + os.replace: a reader can
    never observe a partially-written cache entry (a truncated entry
    segfaults deserialize_executable in the next warm-start — observed on
    this suite after a harness-killed run). The patch must be installed,
    produce complete entries, and leave no tmp droppings."""
    from jax._src import lru_cache as _lru

    from tntorch_tpu.utils import _patch_atomic_cache_writes

    _patch_atomic_cache_writes()
    assert getattr(_lru.LRUCache.put, "_tnt_atomic", False)

    cache = _lru.LRUCache(str(tmp_path), max_size=-1)  # eviction disabled
    payload = b"x" * 4096
    cache.put("entry", payload)
    assert cache.get("entry") == payload
    leftovers = [p.name for p in tmp_path.iterdir() if ".tmp." in p.name]
    assert leftovers == [], leftovers
    # idempotent: same-key put is a no-op, entry stays intact
    cache.put("entry", b"different")
    assert cache.get("entry") == payload


def test_compilation_cache_get_verifies_crc(tmp_path):
    """get() verifies the {key}.crc32 sidecar before handing bytes to the
    C++ executable deserializer: a corrupted entry reports a MISS (and is
    deleted so the re-put lands) instead of segfaulting the process; an
    entry without a sidecar (unpatched jax writer) passes through."""
    from jax._src import lru_cache as _lru

    from tntorch_tpu.utils import _patch_atomic_cache_writes

    _patch_atomic_cache_writes()
    cache = _lru.LRUCache(str(tmp_path), max_size=-1)
    payload = b"y" * 4096
    cache.put("entry", payload)
    assert (tmp_path / "entry.crc32").exists()
    assert cache.get("entry") == payload

    # Corrupt the entry in place (same length, flipped bytes): the crc
    # mismatch must surface as a miss, with both files cleaned up
    (tmp_path / "entry-cache").write_bytes(b"z" * 4096)
    assert cache.get("entry") is None
    assert not (tmp_path / "entry-cache").exists()
    assert not (tmp_path / "entry.crc32").exists()
    # ... and the subsequent put repopulates a clean entry
    cache.put("entry", payload)
    assert cache.get("entry") == payload

    # Legacy entry written by unpatched jax (no sidecar): passes through
    (tmp_path / "legacy-cache").write_bytes(b"w" * 128)
    assert cache.get("legacy") == b"w" * 128


def test_compilation_cache_put_sweeps_stale_tmps(tmp_path):
    """A process killed between tmp-write and replace leaves a {key}.tmp.{pid}
    dropping; the first put of a later process sweeps droppings older than
    an hour (fresh ones may belong to a live concurrent writer and stay)."""
    import os

    from jax._src import lru_cache as _lru

    from tntorch_tpu.utils import _patch_atomic_cache_writes

    _patch_atomic_cache_writes()
    stale = tmp_path / "dead.tmp.99999"
    stale.write_bytes(b"torn")
    os.utime(stale, (1.0, 1.0))  # ancient mtime
    fresh = tmp_path / "live.tmp.88888"
    fresh.write_bytes(b"inflight")

    cache = _lru.LRUCache(str(tmp_path), max_size=-1)
    cache.put("entry", b"v" * 64)
    assert not stale.exists()
    assert fresh.exists()


def test_cache_quarantine_on_crash(tmp_path):
    """A cache entry whose deserialization crashed a process (dead-pid
    intent file) is quarantined on the next sweep; live-pid and own-pid
    intents are left alone (utils._sweep_dead_intents)."""
    import os

    from tntorch_tpu.utils import _sweep_dead_intents

    d = str(tmp_path)
    # dead-pid intent naming an entry -> entry + sidecar removed
    (tmp_path / "jit_foo-abc-cache").write_bytes(b"x")
    (tmp_path / "jit_foo-abc.crc32").write_bytes(b"1:00000000")
    (tmp_path / ".inflight.999999999").write_text("jit_foo-abc")
    # own-pid intent naming another entry -> left alone
    (tmp_path / "jit_bar-def-cache").write_bytes(b"y")
    (tmp_path / f".inflight.{os.getpid()}").write_text("jit_bar-def")
    _sweep_dead_intents(d)
    assert not (tmp_path / "jit_foo-abc-cache").exists()
    assert not (tmp_path / "jit_foo-abc.crc32").exists()
    assert not (tmp_path / ".inflight.999999999").exists()
    assert (tmp_path / "jit_bar-def-cache").exists()
    assert (tmp_path / f".inflight.{os.getpid()}").exists()


def test_cache_guard_records_and_clears_intent(tmp_path, monkeypatch):
    """The guarded get_executable_and_time is installed, writes the key to
    a per-pid intent file before deserializing, and clears it after."""
    import os

    import jax

    from jax._src import compilation_cache as cc

    assert getattr(cc.get_executable_and_time, "_tnt_guard", False)
    # Cache lookups disabled (no singleton pollution); the guard still
    # wraps the call with the intent-file lifecycle
    monkeypatch.setattr(cc, "_get_cache", lambda backend: None)
    prev = jax.config.jax_compilation_cache_dir
    jax.config.update("jax_compilation_cache_dir", str(tmp_path))
    try:
        out = cc.get_executable_and_time("k" * 10, None, object(), [])
        assert out == (None, None)
        assert not (tmp_path / f".inflight.{os.getpid()}").exists()
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)


def test_suppress_persistent_cache(tmp_path, monkeypatch):
    """utils.suppress_persistent_cache skips cache reads and writes for
    compiles on this thread (jax's own enable flag is memoized globally and
    cannot be toggled mid-process)."""
    import os

    import jax

    from tntorch_tpu import utils as u

    prev = jax.config.jax_compilation_cache_dir
    jax.config.update("jax_compilation_cache_dir", str(tmp_path))
    try:
        f = jax.jit(lambda a: a * 3.25 + 0.5)
        with u.suppress_persistent_cache():
            assert u._cache_suppressed()
            f(jnp.arange(5.0))
        assert not u._cache_suppressed()
        assert not [x for x in os.listdir(tmp_path) if x.endswith("-cache")]
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)


def test_take_mode_onehot_equals_gather(monkeypatch):
    """utils.take_mode: the one-hot-GEMM gather (taken on accelerator
    backends for large 1-D indices) matches the plain fancy gather exactly,
    for 3-D TT cores, batched 4-D cores and 2-D factors; small indices take
    the plain path."""
    from tntorch_tpu import utils as u

    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, 32, 600))
    monkeypatch.setattr(u.jax, "default_backend", lambda: "tpu")
    core3 = jnp.asarray(rng.standard_normal((4, 32, 5)))
    np.testing.assert_allclose(
        np.asarray(u.take_mode(core3, idx)),
        np.asarray(core3[:, idx, :]), atol=1e-12)
    core4 = jnp.asarray(rng.standard_normal((2, 4, 32, 5)))
    np.testing.assert_allclose(
        np.asarray(u.take_mode(core4, idx)),
        np.asarray(core4[:, :, idx, :]), atol=1e-12)
    mat = jnp.asarray(rng.standard_normal((32, 7)))
    np.testing.assert_allclose(
        np.asarray(u.take_mode(mat, idx)), np.asarray(mat[idx]), atol=1e-12)
    # Small index / int dtype: plain gather path
    small = idx[:10]
    np.testing.assert_allclose(
        np.asarray(u.take_mode(core3, small)),
        np.asarray(core3[:, small, :]), atol=0)
    ints = jnp.asarray(rng.integers(0, 9, (32, 3)))
    np.testing.assert_allclose(
        np.asarray(u.take_mode(ints, idx)), np.asarray(ints[idx]), atol=0)
