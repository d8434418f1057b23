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

The "extra" dict carries the other recorded north stars:
- tt_round_batched_gflops: the same rounding vmapped over a batch of 32
  (the throughput story; the single-stream number is dispatch-latency bound)
- cross_hilbert_warm_s: warm wall time of the 5D Hilbert 32^5 eps=1e-6
  TT-cross (reference CPU: ~0.10 s, cross.ipynb cell 1)
- cross_evals_per_s (+ _vs_torch_cpu): f-evals/second of a fixed-rank
  throughput cross config, vs the same sweep algorithm in PyTorch on CPU

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.
"""

import json
import os
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

    leaves = jax.tree_util.tree_leaves(out)
    return float(jnp.sum(leaves[0]).astype(jnp.float32))


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


def bench_ours(cores_np, rmax, iters=10, K=8):
    """Headline: per-sweep throughput of the production performance policy
    (tn.set_policy('high') -> randomized-subspace truncation edges), K=8
    dependent sweeps per dispatch (see _chained_sweeps). The
    one-dispatch-per-sweep number — dominated by the tunnel's ~1.5 ms
    dispatch floor — is recorded separately in the extras
    (tt_round_single_dispatch_gflops); the exact-eigh 'highest' path as
    tt_round_exact_gflops."""
    import jax
    import jax.numpy as jnp

    from tntorch_tpu.ops.rounding import _round_tt_gram_body

    cores = tuple(jnp.asarray(c) for c in cores_np)

    def kernel(cs):
        with jax.default_matmul_precision("high"):
            return tuple(_round_tt_gram_body(list(cs), rmax, edge_solver="rand"))

    run = _chained_sweeps(kernel, cores, K)
    out = run(cores)
    _sync(out)
    out = run(cores)
    _sync(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = run(cores)
        _sync(out)
        best = min(best, (time.perf_counter() - t0) / iters / K)
    return best, out


def bench_ours_single_dispatch(cores_np, rmax, iters=20):
    """One rounding sweep per dispatch under the 'high' policy — what a
    user pays per isolated round_tt_gram call (includes the host dispatch
    cost; through the axon tunnel that floor is ~1.5 ms)."""
    import jax.numpy as jnp

    from tntorch_tpu.ops.rounding import round_tt_gram
    from tntorch_tpu.utils import set_policy

    cores = tuple(jnp.asarray(c) for c in cores_np)
    set_policy("high")
    try:
        out = round_tt_gram(cores, rmax)
        _sync(out)
        out = round_tt_gram(cores, rmax)
        _sync(out)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(iters):
                out = round_tt_gram(cores, rmax)
            _sync(out)
            best = min(best, (time.perf_counter() - t0) / iters)
    finally:
        set_policy("highest")
    return best, out


def bench_ours_prec(cores_np, rmax, precision, iters=10, K=8):
    """Chained per-sweep device throughput under a precision policy mode
    ('default' = single-pass bf16 MXU passes; 'bf16' = bf16 storage +
    f32 accumulation, halving the sweep's HBM traffic). Randomized edges
    (the policy default) in both."""
    import jax
    import jax.numpy as jnp

    from tntorch_tpu.ops.rounding import _round_tt_gram_bf16_jit, _round_tt_gram_body

    cores = tuple(jnp.asarray(c) for c in cores_np)
    if precision == "bf16":
        def kernel(cs):
            return tuple(_round_tt_gram_bf16_jit(tuple(cs), rmax, "rand"))
    else:
        def kernel(cs):
            with jax.default_matmul_precision(precision):
                return tuple(_round_tt_gram_body(list(cs), rmax, edge_solver="rand"))

    run = _chained_sweeps(kernel, cores, K)
    out = run(cores)
    _sync(out)
    out = run(cores)
    _sync(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = run(cores)
        _sync(out)
        best = min(best, (time.perf_counter() - t0) / iters / K)
    return best, out


def bench_ours_exact(cores_np, rmax, iters=10, K=8):
    """Accuracy-first path: 'highest' precision + exact eigh truncation
    edges (the reference's Gram-eig accuracy class, round.py:101-135),
    chained like the headline for a like-for-like device comparison."""
    import jax
    import jax.numpy as jnp

    from tntorch_tpu.ops.rounding import _round_tt_gram_body

    cores = tuple(jnp.asarray(c) for c in cores_np)

    def kernel(cs):
        with jax.default_matmul_precision("highest"):
            return tuple(_round_tt_gram_body(list(cs), rmax, edge_solver="eigh"))

    run = _chained_sweeps(kernel, cores, K)
    out = run(cores)
    _sync(out)
    out = run(cores)
    _sync(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = run(cores)
        _sync(out)
        best = min(best, (time.perf_counter() - t0) / iters / K)
    return best, out


def bench_sparse_tt_svd():
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
    t = tn.sparse_tt_svd(X, y, eps=1e-6, shape=[I] * N, rmax=16)  # warm-up
    _sync(t.cores[0])
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        t = tn.sparse_tt_svd(X, y, eps=1e-6, shape=[I] * N, rmax=16)
        _sync(t.cores[0])
        times.append(time.perf_counter() - t0)
    return P / min(times)


def bench_sparse_tt_svd_large():
    """Sketched sparse_tt_svd (randomized range finder, VERDICT r3 missing
    #4): ~10^6 COO samples on a 16384-row first unfolding that the dense
    path cannot touch (it would scatter a 16384 x 4096 matrix and eigh its
    16384^2 Gram). Complete slices of a planted rank-5 tensor keep the
    zero-filled unfolding low-rank, so the fit is verifiable."""
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
    t = tn.sparse_tt_svd(X, y, eps=3e-3, shape=shape, rmax=16)  # warm-up
    _sync(t.cores[0])
    assert max(t.ranks_tt) <= 16, t.ranks_tt
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        t = tn.sparse_tt_svd(X, y, eps=3e-3, shape=shape, rmax=16)
        _sync(t.cores[0])
        times.append(time.perf_counter() - t0)
    return P / min(times)


def bench_ours_batched(cores_np, rmax, B=32, iters=10, edge_solver="eigh"):
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
    fn = lambda: round_tt_gram_batched(bcores, rmax, edge_solver, use_pallas)
    out = fn()
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    _sync(out)
    return (time.perf_counter() - t0) / iters / B


def bench_torch_cpu(cores_np, rmax, iters=3):
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

    run()  # warm-up
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run()
    return (time.perf_counter() - t0) / iters, out


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

    h = tn.cross(function=fh, domain=d, eps=1e-6, verbose=False, seed=7)
    _sync(h.cores[0])
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        h = tn.cross(function=fh, domain=d, eps=1e-6, verbose=False, seed=7)
        _sync(h.cores[0])
        times.append(time.perf_counter() - t0)
    hilbert_s = min(times)

    N, I, R = _CROSS_N, _CROSS_I, _CROSS_R
    d2 = [jnp.linspace(1, I, I, dtype=jnp.float32)] * N
    kw = dict(function=fh, domain=d2, ranks_tt=R, max_iter=2, verbose=False,
              seed=0, suppress_warnings=True, return_info=True)
    t2, info = tn.cross(**kw)
    _sync(t2.cores[0])
    t0 = time.perf_counter()
    t2, info = tn.cross(**kw)
    _sync(t2.cores[0])
    wall = time.perf_counter() - t0
    return hilbert_s, info["nsamples"] / wall


def bench_cross_callback():
    """Host-callback (non-traceable NumPy f) cross throughput — the
    reference's flagship `domain=` usage (cross.ipynb cell 1, BASELINE.md
    rows 2-3). Where the backend supports jax.pure_callback the host f is
    embedded in the fused chunk program; tunneled PJRT plugins (axon) raise
    UNIMPLEMENTED for host callbacks, so there this records the eager-path
    number (the probe falls back automatically)."""
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
    t2, info = tn.cross(**kw)
    _sync(t2.cores[0])
    t0 = time.perf_counter()
    t2, info = tn.cross(**kw)
    _sync(t2.cores[0])
    wall = time.perf_counter() - t0
    return info["nsamples"] / wall


def bench_cross_torch_cpu():
    """The same fixed-rank cross sweeps in PyTorch on CPU: fiber einsum
    evaluation + QR + maxvol pivoting + interpolation solve — the reference's
    algorithm (cross.py:316-451) on its compute substrate."""
    import torch

    from tntorch_tpu.maxvol import maxvol as np_maxvol

    torch.set_num_threads(os.cpu_count() or 8)
    N, I, R = _CROSS_N, _CROSS_I, _CROSS_R
    xs = torch.linspace(1, I, I, dtype=torch.float32)
    rng = np.random.default_rng(0)

    def fh(args):  # (P, N) values -> (P,)
        return 1.0 / args.sum(dim=1)

    # meshgrid-tensor interfaces for rank-1 inputs reduce to value gathers:
    # fiber (l, i, r) has coordinates [lset row l..., xs[i], rset row r...];
    # evaluate f on the (Rl*I*Rr, N) coordinate matrix (reference
    # cross.py:316-379 in its domain mode).
    xs_np = xs.numpy()
    lsets = [np.zeros((1, 1), dtype=np.int64)] + [None] * (N - 1)
    rsets = [rng.integers(0, I, (R, N - 1 - n)) for n in range(N - 1)] + [
        np.zeros((1, 0), dtype=np.int64)
    ]
    nsamples = 0
    t0 = time.perf_counter()
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
            nsamples += V.numel()
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
    wall = time.perf_counter() - t0
    return nsamples / wall


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
    retrace / fused cross chunks on the real chip (VERDICT r3 next #6).
    Opt out with TNT_BENCH_SKIP_SMOKE=1 (e.g. when iterating on one row)."""
    import subprocess

    if os.environ.get("TNT_BENCH_SKIP_SMOKE"):
        print("# tpu smoke: skipped (TNT_BENCH_SKIP_SMOKE)", file=sys.stderr)
        return
    env = dict(os.environ, TNT_TPU_TESTS="1")
    repo = os.path.dirname(os.path.abspath(__file__))
    t0 = time.time()
    r = subprocess.run(
        [sys.executable, "-m", "pytest", os.path.join(repo, "tests", "test_tpu_live.py"), "-q"],
        env=env, capture_output=True, text=True, timeout=3600, cwd=repo,
    )
    status = "PASSED" if r.returncode == 0 else f"FAILED (rc={r.returncode})"
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
    shapes = [c.shape for c in cores_np]
    flops = round_tt_flops(shapes, rmax)

    stage_t0 = time.time()

    def _stage(name):
        nonlocal_t = time.time()
        print(f"# stage {name} done at t+{nonlocal_t - stage_t0:.0f}s", file=sys.stderr)

    t_ours, _ = bench_ours(cores_np, rmax)
    gflops_ours = flops / t_ours / 1e9
    _stage("headline")

    extra = {}
    try:
        t_batched = bench_ours_batched(cores_np, rmax)
        extra["tt_round_batched_gflops"] = round(flops / t_batched / 1e9, 1)
    except Exception as e:
        print(f"# batched bench failed: {e}", file=sys.stderr)
    _stage("batched")

    # Accuracy-first path ('highest' policy, exact eigh edges — the
    # reference's Gram-eig accuracy class) + batched rand edges + the
    # per-isolated-call (one dispatch per sweep) number
    try:
        t_exact, _ = bench_ours_exact(cores_np, rmax)
        extra["tt_round_exact_gflops"] = round(flops / t_exact / 1e9, 1)
        t_rand_b = bench_ours_batched(cores_np, rmax, edge_solver="rand")
        extra["tt_round_rand_batched_gflops"] = round(flops / t_rand_b / 1e9, 1)
        t_sd, _ = bench_ours_single_dispatch(cores_np, rmax)
        extra["tt_round_single_dispatch_gflops"] = round(flops / t_sd / 1e9, 1)
    except Exception as e:
        print(f"# exact bench failed: {e}", file=sys.stderr)
    _stage("exact+single_dispatch")

    # Performance-mode numbers (tn.set_policy): fast-f32 and bf16-in/f32-acc
    for key, prec in [("tt_round_f32_gflops", "default"), ("tt_round_bf16_gflops", "bf16")]:
        try:
            t_prec, _ = bench_ours_prec(cores_np, rmax, prec)
            extra[key] = round(flops / t_prec / 1e9, 2)
        except Exception as e:
            print(f"# {prec} bench failed: {e}", file=sys.stderr)

    _stage("precision_modes")

    # Cross runs BEFORE the sparse stages: the sketched sparse_tt_svd's
    # ~0.5 GB device allocations were measured to perturb the cross stage's
    # latency-bound chunk timings when it ran last (0.118 s vs 0.070 s in
    # isolation)
    try:
        hilbert_s, evals_s = bench_cross_ours()
        extra["cross_hilbert_warm_s"] = round(hilbert_s, 4)
        extra["cross_evals_per_s"] = round(evals_s, 1)
        try:
            base_evals_s = bench_cross_torch_cpu()
            extra["cross_evals_per_s_vs_torch_cpu"] = round(evals_s / base_evals_s, 2)
        except Exception as e:
            base_evals_s = None
            print(f"# cross torch baseline failed: {e}", file=sys.stderr)
    except Exception as e:
        base_evals_s = None
        print(f"# cross bench failed: {e}", file=sys.stderr)
    try:
        cb_evals_s = bench_cross_callback()
        extra["cross_callback_evals_per_s"] = round(cb_evals_s, 1)
        if base_evals_s:
            extra["cross_callback_vs_torch_cpu"] = round(cb_evals_s / base_evals_s, 2)
    except Exception as e:
        print(f"# cross callback bench failed: {e}", file=sys.stderr)
    _stage("cross")

    try:
        extra["sparse_tt_svd_samples_per_s"] = round(bench_sparse_tt_svd(), 1)
    except Exception as e:
        print(f"# sparse_tt_svd bench failed: {e}", file=sys.stderr)
    try:
        extra["sparse_tt_svd_sketched_samples_per_s"] = round(
            bench_sparse_tt_svd_large(), 1
        )
    except Exception as e:
        print(f"# sketched sparse_tt_svd bench failed: {e}", file=sys.stderr)
    _stage("sparse_tt_svd")

    try:
        t_base, _ = bench_torch_cpu(cores_np, rmax)
        vs_baseline = t_base / t_ours
    except Exception as e:  # torch unavailable: report absolute only
        print(f"# baseline failed: {e}", file=sys.stderr)
        vs_baseline = float("nan")

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
