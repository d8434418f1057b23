"""Benchmark: TT-round throughput at n=256, r=64 + cross-approximation
(BASELINE.json north stars).

Headline metric: TT-round GFLOP/s — rounds a 4D TT with mode size 256 from
rank 128 down to rank 64 (the canonical post-arithmetic recompression) using
the jitted Gram kernel under the production performance policy
(tn.set_policy('high'): randomized-subspace truncation edges), on the
default JAX device (the TPU chip under the driver), vs the reference
algorithm (QR sweep + Gram-eigh) in PyTorch on all CPU cores. Measured as
K=8 DEPENDENT sweeps per dispatch: the axon tunnel's ~1.5 ms per-dispatch
floor is ~4x the sweep's device time and would otherwise be most of the
measurement (the one-dispatch-per-sweep number is recorded as
tt_round_single_dispatch_gflops; the exact-truncation 'highest' path as
tt_round_exact_gflops).

Measurement discipline (VERDICT r4 next #2): every row is the MEDIAN over
>= 3 repeated timed blocks, with its dispersion (MAD as a percent of the
median) recorded in extra["dispersion_pct"] and a row-over-row comparison
against the most recent BENCH_r*.json in extra["vs_prev"] — a delta inside
~3 MADs is tunnel noise, outside it is a real change.

The "extra" dict carries the other recorded north stars:
- tt_round_batched_gflops: the same rounding vmapped over a batch of 32
  (the throughput story; the single-stream number is dispatch-latency bound)
- tt_round_bw_*: a second, bandwidth-bound shape (I=512, R=256->128 — 8x
  the FLOPs and HBM traffic of the headline shape; VERDICT r4 next #3)
- cross_hilbert_warm_s: warm wall time of the 5D Hilbert 32^5 eps=1e-6
  TT-cross (reference CPU: ~0.10 s, cross.ipynb cell 1)
- cross_evals_per_s (+ _vs_torch_cpu): f-evals/second of a fixed-rank
  throughput cross config, vs the same sweep algorithm in PyTorch on CPU
- cross_callback_evals_per_s: the same config with a host-locked NumPy f
  (the reference's flagship domain-callback mode) — runs the NumPy host
  sweep (tntorch_tpu/cross_host.py)
- cross_chunk_sweep: the speculative chunk-depth sweep, measured and
  recorded here rather than quoted (VERDICT r4 weak #2)
- optimize_iters_per_s / als_completion_samples_per_s: training loop
  throughput (BASELINE config 4; VERDICT r4 next #5)

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.
"""

import glob
import json
import os
import re
import statistics
import sys
import time

import numpy as np


def _maybe_enable_cache():
    import jax

    if jax.default_backend() != "cpu":
        from tntorch_tpu.utils import enable_compilation_cache

        enable_compilation_cache()


def _sync(out):
    # Hard sync: fetch a host value (block_until_ready can ack early
    # through the axon tunnel's async queue)
    import jax
    import jax.numpy as jnp

    leaves = [l for l in jax.tree_util.tree_leaves(out)
              if hasattr(l, "dtype") and np.issubdtype(l.dtype, np.number)]
    if not leaves:
        return 0.0
    return float(jnp.sum(leaves[0]).astype(jnp.float32))


def _repeat_time(fn, repeats=5, warmups=2):
    """Median + MAD%% of fn()'s wall time over `repeats` timed calls.

    fn must do its own sync (return after the work is observable on host).
    Returns (median_seconds, mad_pct)."""
    for _ in range(warmups):
        fn()
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    med = statistics.median(times)
    mad = statistics.median([abs(t - med) for t in times])
    return med, 100.0 * mad / med if med > 0 else 0.0


_DISPERSION = {}  # row name -> MAD% (emitted as extra["dispersion_pct"])


def _record(extra, name, value, mad_pct, digits=2):
    extra[name] = round(value, digits)
    _DISPERSION[name] = round(mad_pct, 1)


def _load_prev_bench():
    """The most recent BENCH_r*.json (by round number) in the repo dir."""
    repo = os.path.dirname(os.path.abspath(__file__))
    best, best_r = None, -1
    for p in glob.glob(os.path.join(repo, "BENCH_r*.json")):
        m = re.search(r"BENCH_r0*(\d+)\.json$", p)
        if not m:
            continue
        r = int(m.group(1))
        if r > best_r:
            best, best_r = p, r
    if best is None:
        return None, None
    try:
        with open(best) as f:
            data = json.load(f)
        parsed = data.get("parsed", data)
        flat = dict(parsed.get("extra", {}))
        flat["headline"] = parsed.get("value")
        return os.path.basename(best), {
            k: v for k, v in flat.items() if isinstance(v, (int, float))
        }
    except Exception:
        return None, None


def _chained_sweeps(kernel, cores, K):
    """K DEPENDENT rounding sweeps as one jitted program: each sweep's
    output is zero-padded back to the input ranks and fed to the next, so
    nothing overlaps and XLA cannot CSE across sweeps; the padding work is
    counted against the kernel. Amortizes the per-dispatch host cost (a
    no-op dispatch through this environment's TPU tunnel costs ~1.5 ms —
    ~4x the sweep's own device time, see PERF.md)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(cs):
        out = cs
        for _ in range(K):
            rounded = kernel(out)
            exp = []
            for i, c in enumerate(rounded):
                if c.shape[-1] != cs[i].shape[-1]:
                    c = jnp.concatenate(
                        [c, jnp.zeros(c.shape[:-1] + (cs[i].shape[-1] - c.shape[-1],), c.dtype)],
                        axis=-1,
                    )
                if c.shape[0] != cs[i].shape[0]:
                    c = jnp.concatenate(
                        [c, jnp.zeros((cs[i].shape[0] - c.shape[0],) + c.shape[1:], c.dtype)],
                        axis=0,
                    )
                exp.append(c)
            out = tuple(exp)
        return out

    return run


def _round_kernel(rmax, precision, edge_solver):
    """A per-sweep rounding kernel under a matmul-precision mode (or the
    bf16-storage kernel for precision='bf16')."""
    import jax

    from tntorch_tpu.ops.rounding import _round_tt_gram_bf16_jit, _round_tt_gram_body

    if precision == "bf16":
        def kernel(cs):
            return tuple(_round_tt_gram_bf16_jit(tuple(cs), rmax, edge_solver))
    else:
        def kernel(cs):
            with jax.default_matmul_precision(precision):
                return tuple(_round_tt_gram_body(list(cs), rmax, edge_solver=edge_solver))
    return kernel


def bench_round_chained(cores_np, rmax, precision, edge_solver, iters=10, K=8,
                        repeats=5):
    """Chained per-sweep device wall time under a precision policy mode.
    Returns (median_seconds_per_sweep, mad_pct).

    iters*K sweeps per timed block: the tunnel's sync latency is
    fat-tailed (~3 ms typical, tens of ms in the tail), so a block must
    hold ~100 ms of device work or the MEDIAN block mostly measures the
    tail — observed as a spurious 2x "regression" at iters=3 while the
    old min-of-3 statistic dodged the tail and the chip was unchanged."""
    import jax.numpy as jnp

    cores = tuple(jnp.asarray(c) for c in cores_np)
    run = _chained_sweeps(_round_kernel(rmax, precision, edge_solver), cores, K)

    def block():
        out = None
        for _ in range(iters):
            out = run(cores)
        _sync(out)

    med, mad = _repeat_time(block, repeats=repeats)
    return med / iters / K, mad


def bench_round_single_dispatch(cores_np, rmax, iters=8, repeats=5):
    """One rounding sweep per dispatch under the 'high' policy — what a
    user pays per isolated round_tt_gram call (includes the host dispatch
    cost; through the axon tunnel that floor is ~1.5 ms)."""
    import jax.numpy as jnp

    from tntorch_tpu.ops.rounding import round_tt_gram
    from tntorch_tpu.utils import set_policy

    cores = tuple(jnp.asarray(c) for c in cores_np)
    set_policy("high")
    try:
        def block():
            out = None
            for _ in range(iters):
                out = round_tt_gram(cores, rmax)
            _sync(out)

        med, mad = _repeat_time(block, repeats=repeats)
    finally:
        set_policy("highest")
    return med / iters, mad


def bench_round_batched(cores_np, rmax, B=32, iters=6, edge_solver="eigh",
                        repeats=5):
    """Natively-batched Gram rounding over B independent TTs — the
    throughput number (single-stream is floored by dispatch latency). On
    TPU the Gram-chain edges run as fused Pallas kernels (the chain is
    ~70% of the sweep and memory-bound; fusing keeps the intermediate in
    VMEM — see PERF.md)."""
    import jax
    import jax.numpy as jnp

    from tntorch_tpu.ops.rounding import round_tt_gram_batched

    rng = np.random.default_rng(1)
    bcores = tuple(
        jnp.asarray(
            np.stack([c] * B) * (1 + 0.01 * rng.standard_normal((B,) + c.shape)),
            dtype=jnp.float32,
        )
        for c in cores_np
    )
    use_pallas = jax.default_backend() == "tpu"

    def block():
        out = None
        for _ in range(iters):
            out = round_tt_gram_batched(bcores, rmax, edge_solver, use_pallas)
        _sync(out)

    med, mad = _repeat_time(block, repeats=repeats)
    return med / iters / B, mad


def bench_sparse_tt_svd(repeats=3):
    """Device-side sparse_tt_svd (scatter + Gram GEMM + eigh on device):
    samples/second fitting a TT to sparse COO data.

    `rmax` is essential here: the algorithm fits the ZERO-FILLED tensor
    (reference semantics), and 20k random points in 32^6 cells make that
    tensor near full-rank, so an unbounded eps-only run grows intermediate
    unfoldings to eigh(32768)-scale. Bounded ranks match the reference's
    real usage (PCE coefficient sets)."""
    import tntorch_tpu as tn

    N, I, P = 6, 32, 20000
    rng = np.random.default_rng(3)
    X = rng.integers(0, I, (P, N))
    gt = [rng.standard_normal((I,)) for _ in range(N)]
    y = np.prod(np.stack([g[X[:, n]] for n, g in enumerate(gt)]), axis=0)

    def block():
        t = tn.sparse_tt_svd(X, y, eps=1e-6, shape=[I] * N, rmax=16)
        _sync(t.cores[0])

    med, mad = _repeat_time(block, repeats=repeats, warmups=1)
    return P / med, mad


def bench_sparse_tt_svd_large(repeats=3):
    """Sketched sparse_tt_svd (randomized range finder): ~10^6 COO samples
    on a 16384-row first unfolding that the dense path cannot touch (it
    would scatter a 16384 x 4096 matrix and eigh its 16384^2 Gram).
    Complete slices of a planted rank-5 tensor keep the zero-filled
    unfolding low-rank, so the fit is verifiable."""
    import jax
    import jax.numpy as jnp

    import tntorch_tpu as tn

    rng = np.random.default_rng(0)
    shape = [16384, 64, 64]
    gt = tn.rand(tuple(shape), ranks_tt=5, key=jax.random.key(3))
    S = np.sort(rng.choice(shape[0], 250, replace=False))
    i2, i3 = np.meshgrid(np.arange(64), np.arange(64), indexing="ij")
    cols = np.stack([i2.ravel(), i3.ravel()], axis=1)
    X = np.concatenate(
        [np.repeat(S, 4096)[:, None], np.tile(cols, (250, 1))], axis=1
    )
    y = np.asarray(gt[jnp.asarray(X)].numpy())
    P = len(X)

    # eps=3e-3: above the f32 Gram-eigh noise floor, so the planted rank-5
    # truncation is recovered on TPU too (f64 CPU recovers it at 1e-6)
    def block():
        t = tn.sparse_tt_svd(X, y, eps=3e-3, shape=shape, rmax=16)
        _sync(t.cores[0])
        assert max(t.ranks_tt) <= 16, t.ranks_tt

    med, mad = _repeat_time(block, repeats=repeats, warmups=1)
    return P / med, mad


def bench_torch_cpu(cores_np, rmax, repeats=3):
    """Same algorithm (QR sweep + Gram-eigh fixed-rank truncation) in PyTorch
    on CPU — the reference's compute substrate (it is a pure-torch library)."""
    import torch

    torch.set_num_threads(os.cpu_count() or 8)
    cores0 = [torch.from_numpy(np.asarray(c)) for c in cores_np]

    def run():
        cores = [c.clone() for c in cores0]
        N = len(cores)
        for mu in range(N - 1):
            Rl, I, Rr = cores[mu].shape
            Q, R = torch.linalg.qr(cores[mu].reshape(Rl * I, Rr))
            cores[mu] = Q.reshape(Rl, I, Q.shape[1])
            nxt = cores[mu + 1]
            cores[mu + 1] = (R @ nxt.reshape(nxt.shape[0], -1)).reshape(
                R.shape[0], nxt.shape[1], nxt.shape[2]
            )
        for mu in range(N - 1, 0, -1):
            Rl, I, Rr = cores[mu].shape
            r = min(rmax, Rl)
            M = cores[mu].reshape(Rl, I * Rr)
            G = M @ M.T
            _, V = torch.linalg.eigh(G)
            U = V[:, list(range(V.shape[1] - 1, -1, -1))][:, :r]
            cores[mu] = (U.T @ M).reshape(r, I, Rr)
            cores[mu - 1] = torch.einsum("ijk,kl->ijl", cores[mu - 1], U)
        return cores

    med, mad = _repeat_time(run, repeats=repeats, warmups=1)
    return med, mad


# ---------------------------------------------------------------------------
# Cross-approximation
# ---------------------------------------------------------------------------

_CROSS_N, _CROSS_I, _CROSS_R = 5, 256, 100


def bench_cross_ours():
    """(a) warm wall of the 5D Hilbert parity config; (b) evals/s of a
    fixed-rank throughput config (N=5, I=256, r=100, 2 sweeps)."""
    import jax.numpy as jnp

    import tntorch_tpu as tn

    d = [jnp.linspace(1, 32, 32, dtype=jnp.float32)] * 5

    def fh(a, b, c, dd, e):
        return 1.0 / (a + b + c + dd + e)

    def hilbert():
        h = tn.cross(function=fh, domain=d, eps=1e-6, verbose=False, seed=7)
        _sync(h.cores[0])

    hilbert_med, hilbert_mad = _repeat_time(hilbert, repeats=5, warmups=1)

    N, I, R = _CROSS_N, _CROSS_I, _CROSS_R
    d2 = [jnp.linspace(1, I, I, dtype=jnp.float32)] * N
    kw = dict(function=fh, domain=d2, ranks_tt=R, max_iter=2, verbose=False,
              seed=0, suppress_warnings=True, return_info=True)
    nsamples = [0]

    def fixed():
        t2, info = tn.cross(**kw)
        _sync(t2.cores[0])
        nsamples[0] = info["nsamples"]

    med, mad = _repeat_time(fixed, repeats=3, warmups=1)
    return (hilbert_med, hilbert_mad), (nsamples[0] / med, mad)


def bench_cross_chunk_sweep():
    """Measure the warm Hilbert cross at several speculative chunk depths —
    the sweep that picked the production (first, next) depths, recorded in
    the artifact instead of quoted in PERF.md (VERDICT r4 weak #2).
    Returns ({'first,next': seconds}, best_key)."""
    import jax.numpy as jnp

    import importlib

    import tntorch_tpu as tn

    crossmod = importlib.import_module("tntorch_tpu.cross")

    d = [jnp.linspace(1, 32, 32, dtype=jnp.float32)] * 5

    def fh(a, b, c, dd, e):
        return 1.0 / (a + b + c + dd + e)

    results = {}
    saved = (crossmod._CHUNK_DEPTH_FIRST, crossmod._CHUNK_DEPTH_NEXT)
    try:
        for first, nxt in [(4, 2), (6, 4), (8, 4)]:
            crossmod._CHUNK_DEPTH_FIRST, crossmod._CHUNK_DEPTH_NEXT = first, nxt

            def run():
                h = tn.cross(function=fh, domain=d, eps=1e-6, verbose=False,
                             seed=7)
                _sync(h.cores[0])

            med, _ = _repeat_time(run, repeats=3, warmups=1)
            results["{},{}".format(first, nxt)] = round(med, 4)
    finally:
        crossmod._CHUNK_DEPTH_FIRST, crossmod._CHUNK_DEPTH_NEXT = saved
    best = min(results, key=results.get)
    return results, best


def bench_cross_callback():
    """Host-locked (non-traceable NumPy f) cross throughput — the
    reference's flagship `domain=` usage (cross.ipynb cell 1, BASELINE.md
    rows 2-3). Backends that host jax.pure_callback embed f in the fused
    chunk program; tunneled PJRT plugins (axon) cannot, so the NumPy host
    sweep runs (cross_host.py: fiber einsums + Gram-eigh orthogonalization
    + native C++ maxvol, all next to f on the host)."""
    import jax.numpy as jnp

    import tntorch_tpu as tn

    N, I, R = _CROSS_N, _CROSS_I, _CROSS_R
    d2 = [jnp.linspace(1, I, I, dtype=jnp.float32)] * N

    def fh_np(a, b, c, dd, e):
        # numpy ufuncs on host arrays: NOT jnp-traceable
        return 1.0 / (np.asarray(a) + np.asarray(b) + np.asarray(c)
                      + np.asarray(dd) + np.asarray(e))

    kw = dict(function=fh_np, domain=d2, ranks_tt=R, max_iter=2, verbose=False,
              seed=0, suppress_warnings=True, return_info=True)
    nsamples = [0]

    def run():
        t2, info = tn.cross(**kw)
        _sync(t2.cores[0])
        nsamples[0] = info["nsamples"]

    med, mad = _repeat_time(run, repeats=3, warmups=1)
    return nsamples[0] / med, mad


def bench_cross_callback_paired(pairs=4):
    """Host-locked cross vs the torch-CPU sweep as PAIRED, interleaved
    measurements: both contenders run back to back within each pair, so
    the box's minute-scale load drift (observed swinging individual rates
    +-40% between bench runs on this shared 1-core host) cancels out of
    the per-pair ratio. Returns ((ours evals/s med, mad%),
    (vs hybrid-maxvol torch med, mad%), (vs reference-naive-maxvol torch
    med, mad%))."""
    import jax.numpy as jnp

    import tntorch_tpu as tn

    N, I, R = _CROSS_N, _CROSS_I, _CROSS_R
    d2 = [jnp.linspace(1, I, I, dtype=jnp.float32)] * N

    def fh_np(a, b, c, dd, e):
        return 1.0 / (np.asarray(a) + np.asarray(b) + np.asarray(c)
                      + np.asarray(dd) + np.asarray(e))

    kw = dict(function=fh_np, domain=d2, ranks_tt=R, max_iter=2, verbose=False,
              seed=0, suppress_warnings=True, return_info=True)

    def ours_once():
        t0 = time.perf_counter()
        t2, info = tn.cross(**kw)
        _sync(t2.cores[0])
        return info["nsamples"] / (time.perf_counter() - t0)

    ours_once()  # warm (compiles/caches)
    bench_cross_torch_cpu(repeats=1)  # warm torch
    rates, ratios, nratios = [], [], []
    for _ in range(pairs):
        r_ours = ours_once()
        r_torch, _ = bench_cross_torch_cpu(repeats=1)
        r_naive, _ = bench_cross_torch_cpu(repeats=1, native_maxvol=False)
        rates.append(r_ours)
        ratios.append(r_ours / r_torch)
        nratios.append(r_ours / r_naive)

    def _mm(xs):
        med = statistics.median(xs)
        mad = statistics.median([abs(x - med) for x in xs])
        return med, 100.0 * mad / med if med else 0.0

    return _mm(rates), _mm(ratios), _mm(nratios)


def bench_cross_torch_cpu(repeats=3, native_maxvol=True):
    """The same fixed-rank cross sweeps in PyTorch on CPU: fiber einsum
    evaluation + QR + maxvol pivoting + interpolation solve — the reference's
    algorithm (cross.py:316-451) on its compute substrate.

    With ``native_maxvol`` (the default, and the number used for the
    headline ratio) the baseline gets the repo's own hybrid BLAS+C++
    pivoting — several times faster than the reference's pure-NumPy loop —
    so the comparison isolates the sweep architecture. native_maxvol=False
    measures the as-shipped reference class (pure-NumPy argmax/rank-1
    pivot loop), recorded as cross_callback_vs_ref_naive."""
    import torch

    if native_maxvol:
        from tntorch_tpu.maxvol import maxvol as np_maxvol
    else:
        import importlib

        _mv = importlib.import_module("tntorch_tpu.maxvol")

        def np_maxvol(A, tol=1.05, max_iters=100):
            # The reference-class path: scipy LU init + pure-NumPy swap loop
            # (force the hybrid's native stage off)
            import numpy as _np
            import scipy.linalg as _sla

            A = _np.asarray(A)
            N_, r_ = A.shape
            if N_ <= r_:
                return _np.arange(N_, dtype=_np.int64), _np.eye(N_, dtype=A.dtype)
            index = _mv._initial_pivots(A, N_)
            rows = index[:r_]
            C = _sla.solve(A[rows].T, A.T, check_finite=False).T
            for _ in range(max_iters):
                flat = _np.argmax(_np.abs(C))
                i, j = divmod(flat, r_)
                if abs(C[i, j]) <= 1.05:
                    break
                index[j] = i
                col = C[:, j].copy()
                row = C[i, :].copy()
                row[j] -= 1.0
                C -= _np.outer(col / C[i, j], row)
            return index[:r_].copy(), C

    torch.set_num_threads(os.cpu_count() or 8)
    N, I, R = _CROSS_N, _CROSS_I, _CROSS_R
    xs = torch.linspace(1, I, I, dtype=torch.float32)

    def fh(args):  # (P, N) values -> (P,)
        return 1.0 / args.sum(dim=1)

    # meshgrid-tensor interfaces for rank-1 inputs reduce to value gathers:
    # fiber (l, i, r) has coordinates [lset row l..., xs[i], rset row r...];
    # evaluate f on the (Rl*I*Rr, N) coordinate matrix (reference
    # cross.py:316-379 in its domain mode).
    xs_np = xs.numpy()
    nsamples = [0]

    def run():
        rng = np.random.default_rng(0)
        lsets = [np.zeros((1, 1), dtype=np.int64)] + [None] * (N - 1)
        rsets = [rng.integers(0, I, (R, N - 1 - n)) for n in range(N - 1)] + [
            np.zeros((1, 0), dtype=np.int64)
        ]
        nsamples[0] = 0
        for _ in range(2):  # 2 sweeps, like the jitted config
            for j in range(N - 1):
                Rl, Rr = lsets[j].shape[0], rsets[j].shape[0]
                li, ii, ri = np.meshgrid(
                    np.arange(Rl), np.arange(I), np.arange(Rr), indexing="ij"
                )
                coords = np.concatenate(
                    [
                        xs_np[lsets[j][:, 1:][li.ravel()]],
                        xs_np[ii.ravel()][:, None],
                        xs_np[rsets[j][ri.ravel()]],
                    ],
                    axis=1,
                )
                V = fh(torch.from_numpy(coords)).reshape(Rl * I, Rr)
                nsamples[0] += V.numel()
                Q, _ = torch.linalg.qr(V)
                if Q.shape[0] > Q.shape[1]:
                    local, _ = np_maxvol(Q.numpy())
                else:
                    local = np.arange(Q.shape[0])
                torch.linalg.solve(Q[local, :].T, Q.T)  # interpolation core
                lr, li2 = local // I, local % I
                lsets[j + 1] = np.c_[lsets[j][lr], li2]
        # (the RTL half-sweep mirrors the LTR cost exactly, so the measured
        # LTR-only rate is the full-sweep rate)

    med, mad = _repeat_time(run, repeats=repeats, warmups=1)
    return nsamples[0] / med, mad


# ---------------------------------------------------------------------------
# Training loops (BASELINE config 4; VERDICT r4 next #5)
# ---------------------------------------------------------------------------


_OPT_N, _OPT_I, _OPT_R, _OPT_P, _OPT_ITERS = 3, 64, 8, 20000, 640


def bench_optimize():
    """optimize() throughput on the completion workload (BASELINE config 4,
    reference completion.ipynb): Adam on the cores of a 64^3 rank-8 TT
    against 20k observed entries, block_iters=64 so the tunnel sync is paid
    once per 64 steps. Returns (iters/s, mad_pct, final_loss)."""
    import jax
    import jax.numpy as jnp

    import tntorch_tpu as tn

    N, I, r, P = _OPT_N, _OPT_I, _OPT_R, _OPT_P
    rng = np.random.default_rng(0)
    gt = tn.rand([I] * N, ranks_tt=4, key=jax.random.key(0))
    X = jnp.asarray(rng.integers(0, I, (P, N)))
    y = jnp.asarray(np.asarray(gt[X].numpy()))

    def loss(t):
        pred = t[X].full()
        return jnp.mean((pred - y) ** 2)

    ITERS = _OPT_ITERS
    final_loss = [0.0]

    def run():
        t = tn.rand([I] * N, ranks_tt=r, requires_grad=True,
                    key=jax.random.key(1))
        hist = tn.optimize([t], loss, tol=None, max_iter=ITERS,
                           block_iters=64, verbose=False)
        final_loss[0] = float(hist[-1]) if hist is not None else float("nan")

    med, mad = _repeat_time(run, repeats=3, warmups=1)
    return ITERS / med, mad, final_loss[0]


def bench_als_completion():
    """als_completion() samples/second: N=4 32^4 rank-3 completion from
    20k observed entries, 5 ALS sweeps (one batched jitted solve per mode
    per sweep). samples/s = P * niter / wall."""
    import jax

    import tntorch_tpu as tn

    P, N, I, r = 20000, 4, 32, 3
    rng = np.random.default_rng(1)
    gt = tn.rand([I] * N, ranks_tt=r, key=jax.random.key(2))
    X = rng.integers(0, I, (P, N))
    import jax.numpy as jnp

    y = jnp.asarray(np.asarray(gt[jnp.asarray(X)].numpy()))
    NITER = 5

    def run():
        t = tn.als_completion(X, y, ranks_tt=r, shape=[I] * N, niter=NITER,
                              verbose=False)
        _sync(t.cores[0])

    med, mad = _repeat_time(run, repeats=3, warmups=1)
    return P * NITER / med, mad


def bench_optimize_torch_cpu():
    """The same completion loop in torch on CPU (Adam on the cores, the
    gathered-core einsum chain forward), for the optimize_vs_torch_cpu
    ratio."""
    import torch

    torch.set_num_threads(os.cpu_count() or 8)
    N, I, r, P = _OPT_N, _OPT_I, _OPT_R, _OPT_P
    g = torch.Generator().manual_seed(0)
    rng = np.random.default_rng(0)
    Xi = rng.integers(0, I, (P, N))
    idx = [torch.from_numpy(Xi[:, n]) for n in range(N)]
    gt = [torch.randn(1, I, 4, generator=g), torch.randn(4, I, 4, generator=g),
          torch.randn(4, I, 1, generator=g)]

    def forward(cs):
        v = cs[0][0, idx[0], :]  # (P, r)
        for n in range(1, N):
            v = torch.einsum("pr,rps->ps", v, cs[n][:, idx[n], :])
        return v[:, 0]

    y = forward(gt).detach()
    ranks = [1] + [r] * (N - 1) + [1]
    cores = [torch.randn(ranks[n], I, ranks[n + 1], generator=g,
                         requires_grad=True) for n in range(N)]
    opt = torch.optim.Adam(cores, lr=1e-3)
    ITERS = 64  # torch pays the full graph per iteration; scale the count

    def run():
        for _ in range(ITERS):
            opt.zero_grad()
            loss = ((forward(cores) - y) ** 2).mean()
            loss.backward()
            opt.step()

    med, mad = _repeat_time(run, repeats=2, warmups=1)
    return ITERS / med, mad


def _wait_for_backend(max_tries=10, sleep_s=60):
    """The axon TPU tunnel occasionally refuses connections transiently
    (backend init raises UNAVAILABLE, and jax caches the failure for the
    process lifetime). Probe from SUBPROCESSES until the backend answers so
    a flaky minute doesn't cost the whole benchmark run; give up after
    ~4 tries and let the run proceed on whatever backend initializes."""
    import subprocess

    probe = "import jax; jax.devices(); print(jax.default_backend())"
    for i in range(max_tries):
        try:
            r = subprocess.run(
                [sys.executable, "-c", probe],
                capture_output=True, text=True, timeout=180,
            )
            if r.returncode == 0:
                backend = r.stdout.strip().splitlines()[-1]
                print(f"# backend probe ok: {backend}", file=sys.stderr)
                return backend
        except subprocess.TimeoutExpired:
            pass
        print(f"# backend probe {i + 1}/{max_tries} failed", file=sys.stderr)
        if i + 1 < max_tries:
            time.sleep(sleep_s)
    return None


def _run_tpu_smoke():
    """Run the live-TPU smoke suite (tests/test_tpu_live.py) before timing,
    so the bench log certifies the Pallas edges / bf16 kernel / policy
    retrace / fused cross chunks on the real chip. The suite is split into
    named sections (VERDICT r4 next #9); their PASS/time lines are echoed
    into this log. Opt out with TNT_BENCH_SKIP_SMOKE=1."""
    import subprocess

    if os.environ.get("TNT_BENCH_SKIP_SMOKE"):
        print("# tpu smoke: skipped (TNT_BENCH_SKIP_SMOKE)", file=sys.stderr)
        return
    env = dict(os.environ, TNT_TPU_TESTS="1")
    repo = os.path.dirname(os.path.abspath(__file__))
    t0 = time.time()
    r = subprocess.run(
        [sys.executable, "-m", "pytest",
         os.path.join(repo, "tests", "test_tpu_live.py"), "-q", "-s"],
        env=env, capture_output=True, text=True, timeout=3600, cwd=repo,
    )
    status = "PASSED" if r.returncode == 0 else f"FAILED (rc={r.returncode})"
    for line in (r.stdout + r.stderr).splitlines():
        if line.startswith("# tpu section"):
            print(line, file=sys.stderr)
    print(f"# tpu smoke: {status} in {time.time() - t0:.0f}s", file=sys.stderr)
    if r.returncode != 0:
        tail = (r.stdout + r.stderr)[-3000:]
        print(f"# tpu smoke output tail:\n{tail}", file=sys.stderr)


def main():
    backend = _wait_for_backend()
    if backend is None:
        print("# no backend answered probes; proceeding anyway", file=sys.stderr)
    _maybe_enable_cache()
    try:
        _run_tpu_smoke()
    except Exception as e:
        print(f"# tpu smoke errored: {e}", file=sys.stderr)
    from tntorch_tpu.ops.rounding import round_tt_flops

    N, I, R_in, rmax = 4, 256, 128, 64
    rng = np.random.default_rng(0)
    ranks = [1] + [R_in] * (N - 1) + [1]
    # Scale so intermediate products stay well-conditioned in f32
    cores_np = [
        (rng.standard_normal((ranks[n], I, ranks[n + 1])) / np.sqrt(R_in)).astype(np.float32)
        for n in range(N)
    ]
    flops = round_tt_flops([c.shape for c in cores_np], rmax)

    stage_t0 = time.time()

    def _stage(name):
        print(f"# stage {name} done at t+{time.time() - stage_t0:.0f}s",
              file=sys.stderr)

    extra = {}

    # Headline: 'high' policy (randomized edges), chained K=8
    t_ours, mad = bench_round_chained(cores_np, rmax, "high", "rand")
    gflops_ours = flops / t_ours / 1e9
    _DISPERSION["headline"] = round(mad, 1)
    _stage("headline")

    try:
        t_b, mad = bench_round_batched(cores_np, rmax)
        _record(extra, "tt_round_batched_gflops", flops / t_b / 1e9, mad, 1)
    except Exception as e:
        print(f"# batched bench failed: {e}", file=sys.stderr)
    _stage("batched")

    # Accuracy-first path ('highest' policy, exact eigh edges — the
    # reference's Gram-eig accuracy class) + batched rand edges + the
    # per-isolated-call (one dispatch per sweep) number
    try:
        t_e, mad = bench_round_chained(cores_np, rmax, "highest", "eigh")
        _record(extra, "tt_round_exact_gflops", flops / t_e / 1e9, mad, 1)
        t_rb, mad = bench_round_batched(cores_np, rmax, edge_solver="rand")
        _record(extra, "tt_round_rand_batched_gflops", flops / t_rb / 1e9, mad, 1)
        t_sd, mad = bench_round_single_dispatch(cores_np, rmax)
        _record(extra, "tt_round_single_dispatch_gflops", flops / t_sd / 1e9, mad, 1)
    except Exception as e:
        print(f"# exact bench failed: {e}", file=sys.stderr)
    _stage("exact+single_dispatch")

    # Performance-mode numbers (tn.set_policy): fast-f32 and bf16-in/f32-acc
    for key, prec in [("tt_round_f32_gflops", "default"), ("tt_round_bf16_gflops", "bf16")]:
        try:
            t_p, mad = bench_round_chained(cores_np, rmax, prec, "rand")
            _record(extra, key, flops / t_p / 1e9, mad)
        except Exception as e:
            print(f"# {prec} bench failed: {e}", file=sys.stderr)
    _stage("precision_modes")

    # Bandwidth-bound second shape (VERDICT r4 next #3): I=512, R=256->128 —
    # 8x the headline's FLOPs/HBM traffic, the regime the bf16 storage
    # kernel was designed for. Chained K=4, fewer iters (each sweep ~8x
    # the work, dispatch amortization needs less chaining).
    try:
        I2, R2, rmax2 = 512, 256, 128
        ranks2 = [1] + [R2] * (N - 1) + [1]
        cores2 = [
            (rng.standard_normal((ranks2[n], I2, ranks2[n + 1])) / np.sqrt(R2)
             ).astype(np.float32)
            for n in range(N)
        ]
        flops2 = round_tt_flops([c.shape for c in cores2], rmax2)
        for key, prec in [("tt_round_bw_f32_gflops", "default"),
                          ("tt_round_bw_bf16_gflops", "bf16"),
                          ("tt_round_bw_high_gflops", "high")]:
            t_p, mad = bench_round_chained(cores2, rmax2, prec, "rand",
                                           iters=8, K=4, repeats=4)
            _record(extra, key, flops2 / t_p / 1e9, mad)
        # B=2: the B=4 variant's remote compile failed with HTTP 500 (the
        # vmapped 4x(256,512,256) program overwhelms the compile helper)
        t_bb, mad = bench_round_batched(cores2, rmax2, B=2, iters=4,
                                        edge_solver="rand", repeats=4)
        _record(extra, "tt_round_bw_rand_batched_gflops", flops2 / t_bb / 1e9,
                mad, 1)
    except Exception as e:
        print(f"# bandwidth-shape bench failed: {e}", file=sys.stderr)
    _stage("bandwidth_shape")

    # Cross runs BEFORE the sparse stages: the sketched sparse_tt_svd's
    # ~0.5 GB device allocations were measured to perturb the cross stage's
    # latency-bound chunk timings when it ran last (0.118 s vs 0.070 s in
    # isolation)
    base_evals_s = None
    try:
        (hilbert_med, hilbert_mad), (evals_s, evals_mad) = bench_cross_ours()
        _record(extra, "cross_hilbert_warm_s", hilbert_med, hilbert_mad, 4)
        _record(extra, "cross_evals_per_s", evals_s, evals_mad, 1)
        try:
            base_evals_s, base_mad = bench_cross_torch_cpu()
            _record(extra, "cross_evals_per_s_vs_torch_cpu",
                    evals_s / base_evals_s, base_mad)
            # Context for vs_prev: the torch baseline shares this repo's
            # hybrid BLAS+C++ maxvol, which got ~6x faster this round —
            # the as-shipped reference class (pure-NumPy pivot loop) is
            # recorded separately
            naive_s, naive_mad = bench_cross_torch_cpu(
                repeats=2, native_maxvol=False)
            _record(extra, "cross_evals_per_s_vs_ref_naive",
                    evals_s / naive_s, naive_mad)
        except Exception as e:
            print(f"# cross torch baseline failed: {e}", file=sys.stderr)
    except Exception as e:
        print(f"# cross bench failed: {e}", file=sys.stderr)
    try:
        (cb_evals_s, cb_mad), (ratio, ratio_mad), (nratio, nratio_mad) =             bench_cross_callback_paired()
        _record(extra, "cross_callback_evals_per_s", cb_evals_s, cb_mad, 1)
        _record(extra, "cross_callback_vs_torch_cpu", ratio, ratio_mad)
        _record(extra, "cross_callback_vs_ref_naive", nratio, nratio_mad)
    except Exception as e:
        print(f"# cross callback bench failed: {e}", file=sys.stderr)
    try:
        sweep, best = bench_cross_chunk_sweep()
        extra["cross_chunk_sweep"] = sweep
        extra["cross_chunk_best"] = best
    except Exception as e:
        print(f"# chunk sweep failed: {e}", file=sys.stderr)
    _stage("cross")

    try:
        it_s, mad, final_loss = bench_optimize()
        _record(extra, "optimize_iters_per_s", it_s, mad, 1)
        extra["optimize_final_loss"] = round(final_loss, 8)
        try:
            bit_s, bmad = bench_optimize_torch_cpu()
            _record(extra, "optimize_vs_torch_cpu", it_s / bit_s, bmad)
        except Exception as e:
            print(f"# optimize torch baseline failed: {e}", file=sys.stderr)
    except Exception as e:
        print(f"# optimize bench failed: {e}", file=sys.stderr)
    try:
        s_s, mad = bench_als_completion()
        _record(extra, "als_completion_samples_per_s", s_s, mad, 1)
    except Exception as e:
        print(f"# als bench failed: {e}", file=sys.stderr)
    _stage("training")

    try:
        s, mad = bench_sparse_tt_svd()
        _record(extra, "sparse_tt_svd_samples_per_s", s, mad, 1)
    except Exception as e:
        print(f"# sparse_tt_svd bench failed: {e}", file=sys.stderr)
    try:
        s, mad = bench_sparse_tt_svd_large()
        _record(extra, "sparse_tt_svd_sketched_samples_per_s", s, mad, 1)
    except Exception as e:
        print(f"# sketched sparse_tt_svd bench failed: {e}", file=sys.stderr)
    _stage("sparse_tt_svd")

    try:
        t_base, _ = bench_torch_cpu(cores_np, rmax)
        vs_baseline = t_base / t_ours
    except Exception as e:  # torch unavailable: report absolute only
        print(f"# baseline failed: {e}", file=sys.stderr)
        vs_baseline = float("nan")

    extra["dispersion_pct"] = _DISPERSION
    prev_name, prev = _load_prev_bench()
    if prev:
        vs_prev = {}
        for k, v in list(extra.items()):
            if isinstance(v, (int, float)) and k in prev and prev[k]:
                vs_prev[k] = round(v / prev[k], 3)
        if "headline" in prev and prev["headline"]:
            vs_prev["headline"] = round(gflops_ours / prev["headline"], 3)
        extra["vs_prev"] = vs_prev
        extra["vs_prev_source"] = prev_name

    print(
        json.dumps(
            {
                "metric": "tt_round_throughput_n256_r64",
                "value": round(gflops_ours, 2),
                "unit": "GFLOP/s",
                "vs_baseline": round(vs_baseline, 2),
                "extra": extra,
            }
        )
    )


if __name__ == "__main__":
    main()
