"""Jit-compiled fixed-rank TT rounding — the performance path.

The general `Tensor.round_tt` picks ranks from singular-value tails
(data-dependent shapes -> host sync per mode, reference round.py:147-158).
This kernel instead rounds to a *static* target rank, so the whole sweep
(QR orthogonalization + Gram-eigh truncation) compiles to one XLA program:

- one compilation per (shapes, rmax) bucket, then pure device execution;
- truncation uses the Gram matrix + eigh instead of SVD: the Gram product
  is an MXU matmul and eigh runs on a small R x R matrix, which maps far
  better onto TPU than a full bidiagonalization SVD of the (R x I*R)
  unfolding.

This backs bench.py's TT-round throughput metric (BASELINE.json: GFLOP/s at
n=256, r=64).
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


def cholesky_qr2(M):
    """CholeskyQR2 (Yamamoto et al. 2015): tall-skinny QR as two rounds of
    Gram + Cholesky + triangular solve — all MXU matmuls, no Householder
    reflections. 40-50x faster than jnp.linalg.qr for (R*I, R) unfoldings on
    TPU at equal orthogonality for well-conditioned input. The relative
    jitter keeps the Cholesky alive on rank-deficient input at the cost of
    ~sqrt(jitter) relative error in the discarded directions — which is why
    the 'highest' precision policy keeps Householder QR."""

    def one(M):
        G = M.conj().T @ M  # Hermitian Gram (conj is a no-op for real M)
        # Trace-scaled dtype-aware jitter: it must dominate eps(dtype) *
        # lambda_max <= eps * trace(G) or the Cholesky NaNs on exactly
        # singular Grams (e.g. rounding t+t); a /n-scaled or sub-epsilon
        # jitter rounds away in f32. ~50x above eps keeps Q's orthogonality
        # at the 1e-12 (f64) level on well-conditioned input.
        eps_rel = 1e-14 if jnp.finfo(M.dtype).eps < 1e-10 else 1e-6
        jit = eps_rel * jnp.real(jnp.trace(G)) + jnp.finfo(M.dtype).tiny
        R = jnp.linalg.cholesky(
            G + jit.astype(G.dtype) * jnp.eye(G.shape[0], dtype=G.dtype), upper=True
        )
        # trans=2 solves R^H X = M^H (== the real trans=1 path for real M)
        Q = jax.scipy.linalg.solve_triangular(R, M.conj().T, lower=False, trans=2).conj().T
        return Q, R

    Q1, R1 = one(M)
    Q, R2 = one(Q1)
    return Q, R2 @ R1


def _left_orthogonalize_sweep(cores, qr=jnp.linalg.qr):
    """QR sweep making cores 0..N-2 left-orthogonal (traceable, static shapes)."""
    cores = list(cores)
    N = len(cores)
    for mu in range(N - 1):
        Rl, I, Rr = cores[mu].shape
        Q, R = qr(cores[mu].reshape(Rl * I, Rr))
        cores[mu] = Q.reshape(Rl, I, Q.shape[1])
        nxt = cores[mu + 1]
        cores[mu + 1] = (R @ nxt.reshape(nxt.shape[0], -1)).reshape(
            R.shape[0], nxt.shape[1], nxt.shape[2]
        )
    return cores


left_orthogonalize_sweep = jax.jit(_left_orthogonalize_sweep)


@partial(jax.jit, static_argnums=(1,))
def round_tt_fixed(cores: Sequence[jax.Array], rmax: int):
    """Round a TT (tuple of 3D cores) to rank <= rmax. Fully on-device.

    Equivalent to Tensor.round_tt(rmax=rmax, algorithm='eig') up to the
    rank-selection rule: ranks are fixed at min(rmax, full), never chosen
    from an error budget.
    """
    with jax.default_matmul_precision("highest"):
        return _round_tt_fixed_body(cores, rmax)


def _round_tt_fixed_body(cores, rmax):
    cores = _left_orthogonalize_sweep(list(cores))
    N = len(cores)
    for mu in range(N - 1, 0, -1):
        Rl, I, Rr = cores[mu].shape
        r = min(rmax, Rl)
        M = cores[mu].reshape(Rl, I * Rr)
        # Top-r left singular subspace via the (small) HERMITIAN Gram matrix
        # (conjugation is a no-op for real dtypes; without it, complex cores
        # get a non-Hermitian M M^T and eigh picks a wrong subspace)
        G = M @ M.conj().T
        _, V = jnp.linalg.eigh(G)  # ascending
        U = V[:, ::-1][:, :r]  # (Rl, r)
        cores[mu] = (U.conj().T @ M).reshape(r, I, Rr)
        prev = cores[mu - 1]
        cores[mu - 1] = jnp.einsum("ijk,kl->ijl", prev, U)
    return cores


@jax.jit
def tt_full(cores: Sequence[jax.Array]):
    """Jitted dense reconstruction of a pure TT (chain of batched matmuls)."""
    with jax.default_matmul_precision("highest"):
        return _tt_full_body(cores)


def _tt_full_body(cores):
    factor = cores[0].reshape(-1, cores[0].shape[-1])
    shape = [c.shape[1] for c in cores]
    for c in cores[1:]:
        factor = (factor @ c.reshape(c.shape[0], -1)).reshape(-1, c.shape[-1])
    return factor.reshape(shape)


@jax.jit
def tt_dot(cores1: Sequence[jax.Array], cores2: Sequence[jax.Array]):
    """Jitted TT-TT inner product (core-by-core Lprod chain as matmuls)."""
    with jax.default_matmul_precision("highest"):
        return _tt_dot_body(cores1, cores2)


def _tt_dot_body(cores1, cores2):
    L = jnp.ones((cores2[0].shape[0], cores1[0].shape[0]), dtype=cores1[0].dtype)
    for c1, c2 in zip(cores1, cores2):
        Lc = jnp.einsum("sr,rai->sai", L, c1)
        L = jnp.einsum("saj,sai->ji", c2, Lc)
    return jnp.sum(L)


def _sqrt_factor(G, eps_rel=None):
    """Symmetric PSD square-root factor F (G ~= F F^T) and its inverse-
    transpose Finv = F^{-T}, via jittered Cholesky. Batched over any
    leading dims (one implementation serves the per-sample and batched
    rounding bodies — the jitter policy must not fork).

    Rank-deficient input is common here (rounding t+t makes the prefix Gram
    exactly singular), so the jitter must dominate the Gram's own roundoff
    negatives, which scale like eps(dtype) * lambda_max <= eps * trace(G):
    a trace-SCALED (not trace/n) dtype-aware jitter guarantees positive
    definiteness without the extra eigh a spectral square root would cost
    (an eigh per edge costs ~20% of the whole rounding sweep on TPU)."""
    from jax.scipy.linalg import solve_triangular

    if eps_rel is None:
        # finfo.eps of a complex dtype equals its real component's
        # (complex64 reports bits=64 but is f32-precision)
        eps_rel = 1e-12 if jnp.finfo(G.dtype).eps < 1e-10 else 1e-6
    n = G.shape[-1]
    # G is Hermitian PSD: the trace is real; trans=2 (conjugate transpose)
    # gives Finv = F^{-H}, which reduces to F^{-T} for real dtypes
    tr = jnp.einsum("...ii->...", G).real[..., None, None]
    jitter = eps_rel * tr + jnp.finfo(tr.dtype).tiny
    F = jnp.linalg.cholesky(G + jitter * jnp.eye(n, dtype=G.dtype))  # lower
    eye = jnp.broadcast_to(jnp.eye(n, dtype=G.dtype), G.shape)
    Finv = solve_triangular(F, eye, lower=True, trans=2)
    return F, Finv


def resolve_edge_solver(edge_solver, precision) -> str:
    """Policy-driven edge-solver choice: under the exact-first 'highest'
    policy every truncation basis comes from an eigh; every performance
    policy ('high'/'default'/'bf16') auto-selects the randomized subspace
    edges — the library's fastest kernel (quasi-optimal truncation, zero
    eigh; an R x R eigh costs ~0.5 ms inside a TPU program while the
    replacement matmuls fuse to ~nothing, see PERF.md)."""
    if edge_solver is not None:
        return edge_solver
    return "eigh" if precision == "highest" else "rand"


def round_tt_gram(cores: Sequence[jax.Array], rmax: int, precision: str = None,
                  edge_solver: str = None):
    """Fixed-rank TT rounding WITHOUT orthogonalization sweeps: two-sided
    Gram method (cf. Al Daas, Ballard et al., "Parallel TT rounding based on
    Gram SVD"). Every large operation is a batched matmul (MXU); the only
    dense factorizations are eigh/SVD on small R x R matrices.

    Numerics: like algorithm='eig', the Gram squares the condition number —
    use for f32/bf16 performance mode; the QR path (round_tt_fixed) is the
    accuracy-first variant.

    :param precision: matmul precision mode, default = the library policy
        (``tn.set_policy``): 'highest' | 'high' | 'default' | 'bf16'
        ('bf16' casts the large matmul operands to bfloat16 with f32
        accumulation and f32 factorizations).
    :param edge_solver: 'eigh' (exact truncation) or 'rand' (randomized
        subspace iteration — no eigh at all, ~2x faster on TPU where each
        R x R eigh costs ~0.5 ms; truncation error is quasi-optimal rather
        than optimal). Default (None) follows the precision policy: 'eigh'
        under 'highest', 'rand' under every performance policy.
    """
    from tntorch_tpu.utils import resolve_precision

    precision = resolve_precision(precision)
    edge_solver = resolve_edge_solver(edge_solver, precision)
    if not isinstance(rmax, int):
        rmax = tuple(int(r) for r in rmax)  # per-edge ranks; jit-static
    if precision == "bf16" and jnp.iscomplexobj(cores[0]):
        precision = "highest"  # complex has no bf16 storage form
    if precision == "bf16":
        return _round_tt_gram_bf16_jit(tuple(cores), rmax, edge_solver)
    # (A B=1 ride of the batched fused-Pallas right chain was measured
    # SLOWER than the plain einsum program single-stream — at B=1 XLA's own
    # fusion already keeps the 16 MB T=C*G intermediate pipelined, and the
    # Pallas grid adds launch overhead. The fused edges pay off from the
    # batched path, where the per-edge intermediate is B x 16 MB.)
    return _round_tt_gram_prec_jit(tuple(cores), rmax, precision, edge_solver)


@partial(jax.jit, static_argnums=(1, 2, 3))
def _round_tt_gram_prec_jit(cores, rmax, precision, edge_solver="eigh"):
    with jax.default_matmul_precision(precision):
        return _round_tt_gram_body(cores, rmax, edge_solver=edge_solver)


@partial(jax.jit, static_argnums=(1, 2))
def _round_tt_gram_bf16_jit(cores, rmax, edge_solver="eigh"):
    """bf16-in / f32-accumulate variant: every large contraction consumes
    bfloat16-rounded operands (native MXU input type, half the HBM traffic
    for the stored cores) with float32 accumulation; interface
    factorizations (cholesky/eigh/triangular solves) stay float32. The
    operands are upcast to f32 at the dot (portable: XLA-CPU lacks a
    BF16xBF16=F32 dot thunk; on TPU the convert fuses into the single-pass
    bf16 MXU read under 'default' precision)."""
    f32 = jnp.float32
    bf = jnp.bfloat16
    in_dtype = cores[0].dtype
    cores = [c.astype(bf) for c in cores]
    N = len(cores)

    def mm(spec, a, b):
        with jax.default_matmul_precision("default"):
            return jnp.einsum(spec, a.astype(f32), b.astype(f32))

    G = [None] * (N + 1)
    G[N] = jnp.ones((1, 1), dtype=f32)
    for k in range(N, 1, -1):
        C = cores[k - 1]
        T = mm("aib,bc->aic", C, G[k]).astype(bf)
        G[k - 1] = mm("aic,dic->ad", T, C)

    for k in range(1, N):
        C = cores[k - 1]
        # Left-prefix Gram: the prefix interface is exactly orthonormal
        # after each edge's projection (U^T F^-1 Lk F^-T U = I), so the
        # L-weighting other formulations carry is the identity — Lk is a
        # plain Gram of the right unfolding, one contiguous SYRK GEMM
        Lk = mm("aib,aid->bd", C, C)
        # bf16 contraction noise floors the spectrum around 1e-3 relative
        F, Finv = _sqrt_factor(Lk, eps_rel=1e-3)
        A = F.T @ G[k] @ F
        rk = rmax if isinstance(rmax, int) else rmax[k - 1]
        r = min(rk, A.shape[0])
        if edge_solver == "rand" and r < A.shape[0]:
            U = _subspace_topr(A, r)
        else:
            _, V = jnp.linalg.eigh(A)
            U = V[:, ::-1][:, :r]
        X = Finv @ U
        Y = U.T @ F.T
        cores[k - 1] = mm("aib,bc->aic", C, X).astype(bf)
        nxt = cores[k]
        cores[k] = (
            mm("rb,bj->rj", Y, nxt.reshape(nxt.shape[0], -1))
            .reshape(r, nxt.shape[1], nxt.shape[2])
            .astype(bf)
        )
    return [c.astype(in_dtype) for c in cores]


def _cholqr(Y):
    """One CholeskyQR pass (Q only): Gram + jittered Cholesky + triangular
    solve — fuses to ~nothing inside a jitted program (vs ~0.5 ms per eigh
    of the same size on TPU). Batched over leading dims; the jitter is
    dtype-aware (must exceed eps(dtype) * trace or exactly-singular
    sketches NaN in f32)."""
    from jax.scipy.linalg import solve_triangular

    eps_rel = 1e-12 if jnp.finfo(Y.dtype).eps < 1e-10 else 1e-6
    # Hermitian Gram (conj is a no-op for real dtypes); G = R^H R, and
    # Q = Y R^{-1} needs a PLAIN-transpose solve even for complex Y
    G = jnp.einsum("...ka,...kb->...ab", jnp.conj(Y), Y)
    tr = jnp.einsum("...ii->...", G).real[..., None, None]
    jit = eps_rel * tr + jnp.finfo(tr.dtype).tiny
    R = jnp.linalg.cholesky(G + jit * jnp.eye(G.shape[-1], dtype=Y.dtype), upper=True)
    return jnp.swapaxes(
        solve_triangular(R, jnp.swapaxes(Y, -1, -2), lower=False, trans=1), -1, -2
    )


def _subspace_topr(A, r, q=2, key=None):
    """Orthonormal basis of ~the top-r eigenspace of the PSD matrix A via
    randomized subspace iteration (Halko-Martinsson-Tropp; cf. Al Daas,
    Ballard, Kolda et al., randomized TT rounding): q power iterations with
    CholeskyQR re-orthogonalization — all MXU matmuls, no eigh. A is already
    a Gram matrix (eigenvalues = sigma^2), so each iteration sharpens the
    spectral contrast by sigma^4.

    The default sketch key is folded over (n, r) rather than hard-coded, so
    distinct problem shapes draw distinct Gaussian sketches; callers that
    need a fresh sketch (e.g. to rule out an input near-orthogonal to the
    default one) pass `key` (route it from tn.utils.next_key). The default
    stays data-independent so the natively-batched and vmapped rounding
    bodies remain bit-identical (tests/test_kernels.py)."""
    if key is None:
        key = jax.random.fold_in(jax.random.key(7), A.shape[-1])
        key = jax.random.fold_in(key, r)
    Om = jax.random.normal(key, (A.shape[-1], r), dtype=A.dtype)
    Y = A @ Om
    for _ in range(q):
        Y = A @ _cholqr(Y)
    return _cholqr(Y)


def _round_tt_gram_body(cores, rmax, edge_solver="eigh"):
    """Complex-safe: every Gram is Hermitian (conjugated second operand —
    a no-op for real dtypes), the Cholesky factor pair is (F, F^{-H}), and
    the projections use conjugate transposes."""
    cores = list(cores)
    N = len(cores)
    dtype = cores[0].dtype

    # Right Gram chain over the untouched suffix: G[k] = Gram of cores k+1..N
    G = [None] * (N + 1)
    G[N] = jnp.ones((1, 1), dtype=dtype)
    for k in range(N, 1, -1):
        C = cores[k - 1]  # (Rl, I, Rr)
        T = jnp.einsum("aib,bc->aic", C, G[k])
        G[k - 1] = jnp.einsum("aic,dic->ad", T, jnp.conj(C))

    # Left sweep: truncate each interior edge via small Hermitian eigenproblems
    for k in range(1, N):
        C = cores[k - 1]
        # Left Gram of the prefix ending at edge k. The prefix interface is
        # exactly orthonormal after each edge's projection
        # (U^H F^-1 Lk F^-H U = I), so no L-weighting is needed: a plain
        # Gram of the right unfolding — one contiguous SYRK-shaped GEMM
        Lk = jnp.einsum("aib,aid->bd", jnp.conj(C), C)
        # Square-root factor via trace-scaled-jitter Cholesky (the jitter is
        # sized to survive the exactly-singular Grams rank-deficient input
        # produces, in both f32 and f64 — see _sqrt_factor)
        F, Finv = _sqrt_factor(Lk)
        # Edge Gram in the orthonormalized prefix basis: A = F^H G F;
        # its top-r eigenvectors U_r are the left singular vectors of the
        # middle matrix S = F^H H (A = S S^H) — no SVD needed.
        A = jnp.conj(F).T @ G[k] @ F
        rk = rmax if isinstance(rmax, int) else rmax[k - 1]
        r = min(rk, A.shape[0])
        if edge_solver == "rand" and r < A.shape[0]:
            # Any orthonormal basis U of the top-r subspace gives the same
            # projection (X^H Lk X = U^H U = I below holds for any such U)
            U = _subspace_topr(A, r)
        else:
            _, V = jnp.linalg.eigh(A)  # ascending
            U = V[:, ::-1][:, :r]
        # X = F^{-H} U_r right-multiplies C_k; Y = U_r^H F^H = X^H Lk pushes
        # the middle factor into C_{k+1}
        X = Finv @ U
        Y = jnp.conj(U).T @ jnp.conj(F).T
        cores[k - 1] = jnp.einsum("aib,bc->aic", C, X)
        nxt = cores[k]
        cores[k] = (Y @ nxt.reshape(nxt.shape[0], -1)).reshape(r, nxt.shape[1], nxt.shape[2])
    return cores


def _eps_eig_body(cores, eps, rmax_vec, qr=jnp.linalg.qr):
    """Shared traceable body of the masked Gram-eigh eps rounding (used by
    the non-batch kernel and, vmapped, by the batch kernel).

    XLA needs static shapes, so truncation is a *masked projection*: each
    edge keeps its padded rank but zeroes the discarded spectral directions,
    and the data-dependent effective ranks come back as a small int vector —
    the only host sync. The caller compacts the padded cores outside jit
    (SURVEY.md hard part #1: padded-rank + mask discipline).

    Rank rule matches the reference's reversed-cumsum criterion
    (round.py:147-158) with delta = eps * |t| / sqrt(N-1) (tensor.py:2039).
    """
    cores = _left_orthogonalize_sweep(list(cores), qr=qr)
    N = len(cores)
    dtype = cores[0].dtype
    norm = jnp.linalg.norm(cores[-1].reshape(-1))
    delta = eps / max(1.0, float(np.sqrt(N - 1))) * norm
    effs = []
    disc2 = jnp.zeros((), dtype=norm.dtype)  # discarded spectral energy
    for mu in range(N - 1, 0, -1):
        Rl, I, Rr = cores[mu].shape
        M = cores[mu].reshape(Rl, I * Rr)
        G = M @ M.conj().T  # Hermitian (conj is a no-op for real cores)
        w, V = jnp.linalg.eigh(G)  # ascending; w == sigma^2
        w = jnp.maximum(w, 0.0)
        k_discard = jnp.sum(jnp.cumsum(w) <= delta**2)
        r = jnp.clip(Rl - k_discard, 1, rmax_vec[mu - 1])
        # Actual discarded energy (incl. any rmax cap): smallest Rl-r values
        disc2 = disc2 + jnp.sum(w * (jnp.arange(Rl) < (Rl - r)))
        mask = (jnp.arange(Rl) < r).astype(dtype)
        U = V[:, ::-1] * mask[None, :]  # zero the discarded directions
        s = jnp.sqrt(jnp.maximum(w[::-1], jnp.finfo(dtype).tiny))  # sigma, descending
        # Keep the invariant of the RTL sweep: core_mu gets the
        # row-orthonormal U^H M / sigma (scale pushed LEFT), so the next
        # edge's Gram spectrum still measures the global error
        cores[mu] = (((U.conj().T @ M) / s[:, None]) * mask[:, None]).reshape(Rl, I, Rr)
        prev = cores[mu - 1]
        cores[mu - 1] = jnp.einsum("ijk,kl->ijl", prev, U * s[None, :])
        effs.append(r)
    # Achieved relative error from the discarded spectra: the sweep's
    # truncations are orthogonal projections in orthogonalized gauges, so
    # err^2 = sum of discarded sigma^2 (reference computes this as an eager
    # post-hoc relative_error dot chain, tensor.py:2085-2098)
    reached = jnp.sqrt(disc2) / jnp.maximum(norm, jnp.finfo(norm.dtype).tiny)
    if not effs:  # N == 1: no interior edges, nothing to truncate
        return cores, jnp.zeros((0,), dtype=jnp.int32), reached
    return cores, jnp.stack(effs[::-1]).astype(jnp.int32), reached


@partial(jax.jit, static_argnums=(3,))
def _round_tt_eps_kernel(cores, eps, rmax_vec, fast_qr=False):
    """Masked Gram-eigh eps rounding as ONE jitted program + one sync."""
    qr = cholesky_qr2 if fast_qr else jnp.linalg.qr
    with jax.default_matmul_precision("highest"):
        return _eps_eig_body(list(cores), eps, rmax_vec, qr=qr)


def _eps_svd_body(cores, eps, rmax_vec, qr=jnp.linalg.qr):
    """Shared traceable body of the masked true-SVD eps rounding — the
    accuracy class of the reference's default algorithm='svd'
    (round.py:94-100). Used verbatim by the non-batch kernel and (vmapped)
    by the batch kernel, so batch-vs-loop results agree bit-for-bit
    including factorization gauges (tests/test_tensor.py relies on this)."""
    cores = _left_orthogonalize_sweep(list(cores), qr=qr)
    N = len(cores)
    dtype = cores[0].dtype
    norm = jnp.linalg.norm(cores[-1].reshape(-1))
    delta = eps / max(1.0, float(np.sqrt(N - 1))) * norm
    effs = []
    disc2 = jnp.zeros((), dtype=norm.dtype)  # discarded spectral energy
    for mu in range(N - 1, 0, -1):
        Rl, I, Rr = cores[mu].shape
        M = cores[mu].reshape(Rl, I * Rr)
        U, S, Vt = jnp.linalg.svd(M, full_matrices=False)  # k = min(Rl, I*Rr)
        k = S.shape[0]
        # Pad the factor back to the static width Rl (k <= Rl)
        if k < Rl:
            U = jnp.pad(U, ((0, 0), (0, Rl - k)))
            S = jnp.pad(S, (0, Rl - k))
            Vt = jnp.pad(Vt, ((0, Rl - k), (0, 0)))
        # Largest discardable tail: cumsum of smallest sigma^2 <= delta^2
        S2 = S**2
        k_discard = jnp.sum(jnp.cumsum(S2[::-1]) <= delta**2)
        r = jnp.clip(Rl - k_discard, 1, jnp.minimum(rmax_vec[mu - 1], k))
        # Actual discarded energy (incl. any rmax cap): smallest Rl-r values
        disc2 = disc2 + jnp.sum(S2[::-1] * (jnp.arange(Rl) < (Rl - r)))
        mask = (jnp.arange(Rl) < r).astype(dtype)
        # Keep row-orthonormal V^T here; push U*S left (same invariant as
        # the eig kernel: the next edge's spectrum measures global error)
        cores[mu] = (Vt * mask[:, None]).reshape(Rl, I, Rr)
        prev = cores[mu - 1]
        cores[mu - 1] = jnp.einsum("ijk,kl->ijl", prev, (U * S[None, :]) * mask[None, :])
        effs.append(r)
    reached = jnp.sqrt(disc2) / jnp.maximum(norm, jnp.finfo(norm.dtype).tiny)
    if not effs:  # N == 1: no interior edges, nothing to truncate
        return cores, jnp.zeros((0,), dtype=jnp.int32), reached
    return cores, jnp.stack(effs[::-1]).astype(jnp.int32), reached


@partial(jax.jit, static_argnums=(3,))
def _round_tt_eps_svd_kernel(cores, eps, rmax_vec, fast_qr=False):
    """Masked true-SVD eps rounding as ONE jitted program + one sync."""
    qr = cholesky_qr2 if fast_qr else jnp.linalg.qr
    with jax.default_matmul_precision("highest"):
        return _eps_svd_body(list(cores), eps, rmax_vec, qr=qr)


def _rmax_vec(rmax, N):
    if rmax is None:
        rmax = [np.iinfo(np.int32).max] * (N - 1)
    elif not hasattr(rmax, "__len__"):
        rmax = [rmax] * (N - 1)
    return jnp.asarray(
        [np.iinfo(np.int32).max if r is None else int(r) for r in rmax], dtype=jnp.int32
    )


def round_tt_eps(cores, eps: float, rmax=None, algorithm: str = "eig",
                 return_reached: bool = False):
    """Adaptive-rank TT rounding with a single device->host sync: run the
    jitted masked-truncation kernel (Gram-eigh or true-SVD spectra per
    `algorithm`), then compact the padded cores to the effective ranks on
    the host. Returns a list of compacted cores; with ``return_reached``
    also the achieved relative error as a DEVICE scalar (computed in-kernel
    from the discarded spectra — no extra dot chains, VERDICT r3 weak #4)."""
    cores = tuple(cores)
    N = len(cores)
    rmax_vec = _rmax_vec(rmax, N)
    from tntorch_tpu.utils import resolve_precision

    # The orthogonalization stage switches to the all-matmul CholeskyQR2
    # under performance precision modes (40-50x faster on TPU); 'highest'
    # keeps Householder QR for full rank-deficiency robustness.
    fast_qr = resolve_precision(None) != "highest"
    kernel = _round_tt_eps_svd_kernel if algorithm == "svd" else _round_tt_eps_kernel
    eps_dt = jnp.zeros((), cores[0].dtype).real.dtype  # real even for complex cores
    padded, effs, reached = kernel(cores, jnp.asarray(eps, eps_dt), rmax_vec, fast_qr)
    effs = [1] + [int(e) for e in np.asarray(effs)] + [1]  # the one sync
    out = [c[: effs[k], :, : effs[k + 1]] for k, c in enumerate(padded)]
    if return_reached:
        return out, reached
    return out


@partial(jax.jit, static_argnums=(3,))
def _round_tt_batch_kernel(cores, eps, rmax_vec, algorithm):
    body = _eps_svd_body if algorithm == "svd" else _eps_eig_body
    with jax.default_matmul_precision("highest"):
        return jax.vmap(lambda *cs: body(list(cs), eps, rmax_vec))(*cores)


def round_tt_batch(cores, rmax=None, algorithm: str = "svd",
                   return_reached: bool = False):
    """Fully-jitted batch TT rounding: the SAME masked kernel body as the
    non-batch eps path, vmapped over the batch with eps=0 — which reproduces
    the reference's batch rule rank = min(rmax, rows, cols) per edge
    (round.py:149-150: batch has no error budget; with eps=0 only exact-zero
    spectral tails are discarded, i.e. the structural padding). Running the
    identical body keeps batch-vs-loop agreement exact per sample, including
    factorization gauges. One host sync for the effective ranks.
    Input/output: list of 4D cores (B x Rl x I x Rr)."""
    cores = tuple(cores)
    N = len(cores)
    rmax_vec = _rmax_vec(rmax, N)
    dtype = cores[0].dtype
    padded, effs, reached = _round_tt_batch_kernel(
        cores, jnp.asarray(0.0, jnp.zeros((), dtype).real.dtype), rmax_vec, algorithm
    )
    # Uniform compaction: max effective rank across the batch (per-sample
    # masked zeros beyond a smaller rank stay zero, so values are exact)
    effs = [1] + [int(e) for e in np.asarray(effs).max(axis=0)] + [1]
    out = [c[:, : effs[k], :, : effs[k + 1]] for k, c in enumerate(padded)]
    if return_reached:
        return out, reached  # (B,) device array of per-sample achieved errors
    return out


def _tucker_eps_body(cores, us, eps, dims, algorithm, rmax_tuple):
    """Shared traceable body of the masked Tucker-eps rounding (the eager
    path syncs per mode; reference tensor.py:1911-2006). Used verbatim by
    the non-batch kernel and (vmapped) by the batch kernel.

    `cores` are TT cores (Rl x S x Rr), `us` the Tucker factors (I x S; an
    identity for modes that had none). Truncation is a masked projection:
    factors keep their padded width with discarded columns zeroed, and the
    data-dependent effective Tucker ranks come back as an int vector — the
    only host sync. Like the reference (tensor.py:1945-2006), EVERY mode is
    truncated; `dims` only sets the error split eps/sqrt(len(dims)).
    """
    cores = _left_orthogonalize_sweep(list(cores))
    us = list(us)
    N = len(cores)
    dtype = cores[0].dtype
    delta_scale = eps / max(1.0, float(np.sqrt(len(dims))))
    effs = []
    for mu in range(N - 1, -1, -1):
        core = cores[mu]
        Rl, S, Rr = core.shape
        # Push the core's non-orthogonality into the factor
        perm = jnp.swapaxes(core, -1, -2).reshape(Rl * Rr, S)
        Q, Rm = jnp.linalg.qr(perm)  # S' = min(Rl*Rr, S)
        Sp = Q.shape[1]
        core = jnp.swapaxes(Q.reshape(Rl, Rr, Sp), -1, -2)
        U = us[mu] @ Rm.T  # (I, S')
        # Spectrum of the factor: local error == global error here
        # (everything else in the network is orthogonal)
        delta = delta_scale * jnp.linalg.norm(U)
        # Factor must stay ORTHONORMAL (scale goes into the core,
        # like the eager path's left_ortho=True): the next mode's
        # local spectrum only measures global error if every other
        # node of the network is orthogonal.
        if algorithm == "svd":
            uu, ss, vvt = jnp.linalg.svd(U, full_matrices=False)
            k = ss.shape[0]  # min(I, S')
            w = ss**2
            left_ortho_f = uu  # (I, k), orthonormal columns
            proj = ss[:, None] * vvt  # (k, S'): U = uu @ proj
        else:
            G = U.conj().T @ U  # (S', S'), Hermitian (conj no-op for real)
            w_asc, V = jnp.linalg.eigh(G)
            w = jnp.maximum(w_asc[::-1], 0.0)
            k = Sp
            Vd = V[:, ::-1]  # descending
            sig = jnp.sqrt(jnp.maximum(w, jnp.finfo(dtype).tiny))
            left_ortho_f = (U @ Vd) / sig[None, :]  # orthonormal
            proj = sig[:, None] * Vd.conj().T  # (S', S')
        k_discard = jnp.sum(jnp.cumsum(w[::-1]) <= delta**2)
        # rmax caps IN-PROGRAM: later modes' spectra must see the
        # capped (masked) network, exactly like the eager sweep —
        # capping only at compaction time would let them measure an
        # uncapped network and pick different subspaces
        r = jnp.clip(k - k_discard, 1, min(rmax_tuple[mu], k))
        mask = (jnp.arange(k) < r).astype(dtype)
        us[mu] = left_ortho_f * mask[None, :]  # (I, k), zeroed tail
        cores[mu] = jnp.einsum(
            "isk,as->iak", core, proj * mask[:, None]
        )  # (Rl, k, Rr), zeroed tail slices
        effs.append(r)
        if mu > 0:
            # Right-orthogonalize mu, pushing L into core mu-1
            core = cores[mu]
            Rl = core.shape[0]
            Mt = core.reshape(Rl, -1).T
            Q, L = jnp.linalg.qr(Mt)
            cores[mu] = Q.T.reshape((Q.shape[1],) + core.shape[1:])
            prev = cores[mu - 1]
            # Reduced QR of a wide unfolding (Rl > I*Rr) gives L of shape
            # (min, Rl); the pushed-left width is L.shape[0], not Rl.
            cores[mu - 1] = (prev.reshape(-1, Rl) @ L.T).reshape(
                prev.shape[:-1] + (L.shape[0],)
            )
    return cores, us, jnp.stack(effs[::-1]).astype(jnp.int32)


@partial(jax.jit, static_argnums=(3, 4, 5))
def _round_tucker_eps_kernel(cores, us, eps, dims, algorithm, rmax_tuple):
    """Masked Tucker-eps rounding as ONE jitted program + one sync."""
    with jax.default_matmul_precision("highest"):
        return _tucker_eps_body(list(cores), list(us), eps, dims, algorithm, rmax_tuple)


@partial(jax.jit, static_argnums=(3, 4, 5))
def _round_tucker_batch_kernel(cores, us, eps, dims, algorithm, rmax_tuple):
    """The same body vmapped over the batch dim of the cores (`us` holds the
    shared identity factors) — batch-vs-loop Tucker rounding then agrees
    exactly per sample, including gauges."""
    with jax.default_matmul_precision("highest"):
        return jax.vmap(
            lambda *cs: _tucker_eps_body(list(cs), list(us), eps, dims, algorithm, rmax_tuple)
        )(*cores)


def round_tucker_eps_batch(cores, us, rmax=None, dims=None, algorithm: str = "svd"):
    """Batch Tucker rounding with the reference's batch rule (fixed rank
    min(rmax, full), no error budget -> eps=0): returns (batched cores,
    batched us) compacted to the max effective rank across the batch."""
    N = len(cores)
    if dims is None:
        dims = range(N)
    dims = tuple(int(d) for d in dims)
    if rmax is None:
        rmax = [None] * N
    elif not hasattr(rmax, "__len__"):
        rmax = [rmax] * N
    rmax_tuple = tuple(np.iinfo(np.int32).max if r is None else int(r) for r in rmax)
    out_cores, out_us, effs = _round_tucker_batch_kernel(
        tuple(cores), tuple(us),
        jnp.asarray(0.0, jnp.zeros((), cores[0].dtype).real.dtype),
        dims, algorithm, rmax_tuple
    )
    effs = np.asarray(effs).max(axis=0)  # the one sync
    out_cores, out_us = list(out_cores), list(out_us)
    for mu in range(N):
        r = int(effs[mu])
        out_cores[mu] = out_cores[mu][:, :, :r, :]
        out_us[mu] = out_us[mu][:, :, :r]
    return out_cores, out_us


def round_tucker_eps(cores, us, eps: float, rmax=None, dims=None, algorithm: str = "eig"):
    """Adaptive Tucker-rank rounding with a single device->host sync: the
    jitted masked kernel picks ranks; compaction happens here. Every mode is
    truncated (reference semantics); `dims` only sets the eps/sqrt(len(dims))
    error split. Returns (cores, us).

    `rmax` caps the effective ranks inside the kernel (so later modes'
    truncation decisions see the capped network, like the eager sweep)."""
    N = len(cores)
    if dims is None:
        dims = range(N)
    dims = tuple(int(d) for d in dims)
    if rmax is None:
        rmax = [None] * N
    elif not hasattr(rmax, "__len__"):
        rmax = [rmax] * N
    rmax_tuple = tuple(
        np.iinfo(np.int32).max if r is None else int(r) for r in rmax
    )
    cores = tuple(cores)
    us = tuple(us)
    out_cores, out_us, effs = _round_tucker_eps_kernel(
        cores, us, jnp.asarray(eps, jnp.zeros((), cores[0].dtype).real.dtype),
        dims, algorithm, rmax_tuple
    )
    effs = np.asarray(effs)  # the one sync
    out_cores, out_us = list(out_cores), list(out_us)
    for mu in range(N):
        r = int(effs[mu])
        out_cores[mu] = out_cores[mu][:, :r, :]
        out_us[mu] = out_us[mu][:, :r]
    return out_cores, out_us


def round_tt_flops(shapes, rmax: int) -> float:
    """Nominal FLOP count of the fixed-rank rounding sweep: QR (2mn^2) per
    left-orthogonalization, Gram + eigh + two projections per truncation.
    Used consistently for us and for the CPU baseline in bench.py."""
    flops = 0.0
    shapes = [tuple(s) for s in shapes]
    # LTR QR sweep
    cur = list(shapes)
    for mu in range(len(cur) - 1):
        Rl, I, Rr = cur[mu]
        m, n = Rl * I, Rr
        flops += 2.0 * m * n * n  # QR
        k = min(m, n)
        R2l, I2, R2r = cur[mu + 1]
        flops += 2.0 * k * R2l * I2 * R2r  # push R right
        cur[mu] = (Rl, I, k)
        cur[mu + 1] = (k, I2, R2r)
    # RTL truncation
    for mu in range(len(cur) - 1, 0, -1):
        Rl, I, Rr = cur[mu]
        r = min(rmax, Rl)
        flops += 2.0 * Rl * Rl * I * Rr  # Gram
        flops += 9.0 * Rl**3  # eigh (approx)
        flops += 2.0 * r * Rl * I * Rr  # project
        Pl, PI, PRr = cur[mu - 1]
        flops += 2.0 * Pl * PI * PRr * r  # absorb U left
        cur[mu] = (r, I, Rr)
        cur[mu - 1] = (Pl, PI, r)
    return flops


# ---------------------------------------------------------------------------
# Batched Gram rounding with fused Pallas edges (ops/pallas_gram.py)
# ---------------------------------------------------------------------------

# The per-sample helpers above are written batched (ellipsis einsums), so
# the batched body reuses them directly — one jitter/numerics policy.

@partial(jax.jit, static_argnums=(1, 2, 3, 4, 5))
def round_tt_gram_batched(cores, rmax, edge_solver: str = "eigh",
                          use_pallas: bool = False, precision: str = "highest",
                          interpret: bool = False):
    """Fixed-rank Gram rounding of a BATCH of TTs, written natively batched
    (cores (B, Rl, I, Rr)): small factorizations ride jnp's batched linalg,
    and with ``use_pallas`` the two Gram-chain contractions per edge run as
    fused Pallas kernels that keep the (B, Rl, I, Rr)-sized intermediate in
    VMEM — the chain is ~70% of the sweep's time and memory-bound, so
    fusing it is worth ~1.5-2x end to end on TPU (see PERF.md).

    When every middle edge's shapes qualify, the Pallas path additionally
    runs a NO-PUSH left sweep (VERDICT r3 task 7): the interface transforms
    Y are *deferred* instead of eagerly pushed into the next core — the Lk
    Gram of the pushed core Y@C is computed from the ORIGINAL core as the
    weighted Gram sum_i C_i^T (Y^T Y) C_i (`pallas_wgram`, one HBM read of
    C), and each output core is the fused double-sided projection
    Y_prev @ C @ X (`pallas_proj2`, one read + one write). The (B, r, I,
    Rr) pushed core never exists in HBM; measured 22.3 -> ~17 ms on the
    B=32 N=4 I=256 R=128->64 rand sweep (see PERF.md).

    Matches jax.vmap(_round_tt_gram_body) numerically (same math; the
    Pallas edges and the deferred-push algebra reorder accumulations, so
    agreement is to roundoff). ``interpret`` runs the Pallas kernels in
    interpreter mode (CPU tests of the no-push sweep).
    """
    from tntorch_tpu.ops.pallas_gram import (
        gram_edge_supported,
        pallas_gram_edge,
        pallas_proj2,
        pallas_wgram,
        proj2_supported,
        wgram_supported,
    )

    with jax.default_matmul_precision(precision):
        cores = list(cores)
        N = len(cores)
        dtype = cores[0].dtype
        B = cores[0].shape[0]

        G = [None] * (N + 1)
        G[N] = jnp.ones((B, 1, 1), dtype=dtype)
        for k in range(N, 1, -1):
            C = cores[k - 1]
            if use_pallas and gram_edge_supported(C):
                G[k - 1] = pallas_gram_edge(C, G[k], precision=precision,
                                            interpret=interpret)
            else:
                T = jnp.einsum("zaib,zbc->zaic", C, G[k])
                G[k - 1] = jnp.einsum("zaic,zdic->zad", T, jnp.conj(C))

        def _edge_rank(k):
            rk = rmax if isinstance(rmax, int) else rmax[k - 1]
            return min(rk, cores[k - 1].shape[-1])

        # The no-push sweep applies when every middle edge supports both
        # fused kernels (shapes are static under jit, so this is traced
        # away); otherwise the eager-push loop below runs unchanged.
        def _nopush_ok():
            if not use_pallas or N < 3:
                return False
            for k in range(2, N):
                C = cores[k - 1]
                r_prev = _edge_rank(k - 1)
                r = _edge_rank(k)
                Y_s = jax.ShapeDtypeStruct((B, r_prev, C.shape[1]), C.dtype)
                X_s = jax.ShapeDtypeStruct((B, C.shape[-1], r), C.dtype)
                if not (wgram_supported(C) and proj2_supported(Y_s, C, X_s)):
                    return False
            return True

        def _factorize(C, Gk, Lk, k):
            """Shared per-edge factorization: interface transforms X, Y."""
            F, Finv = _sqrt_factor(Lk)
            A = jnp.swapaxes(jnp.conj(F), -1, -2) @ Gk @ F
            r = _edge_rank(k)
            if edge_solver == "rand" and r < A.shape[-1]:
                U = _subspace_topr(A, r)
            else:
                _, V = jnp.linalg.eigh(A)
                U = V[..., ::-1][..., :r]
            X = Finv @ U
            Y = jnp.swapaxes(jnp.conj(U), -1, -2) @ jnp.swapaxes(jnp.conj(F), -1, -2)
            return X, Y

        if _nopush_ok():
            out = list(cores)
            Yp = None
            for k in range(1, N):
                C = cores[k - 1]  # original core: pushes are deferred
                if Yp is None:
                    # First edge (Rl == 1): plain left-unfolding Gram
                    Lk = jnp.einsum("zaib,zaid->zbd", jnp.conj(C), C)
                else:
                    W = jnp.einsum("zra,zrd->zad", jnp.conj(Yp), Yp)
                    Lk = pallas_wgram(C, W, precision=precision,
                                      interpret=interpret)
                X, Y = _factorize(C, G[k], Lk, k)
                if Yp is None:
                    out[k - 1] = jnp.einsum("zaib,zbc->zaic", C, X)
                else:
                    out[k - 1] = pallas_proj2(Yp, C, X, precision=precision,
                                              interpret=interpret)
                Yp = Y
            Cn = cores[N - 1]
            out[N - 1] = jnp.einsum(
                "zrb,zbj->zrj", Yp, Cn.reshape(B, Cn.shape[1], -1)
            ).reshape(B, Yp.shape[1], Cn.shape[2], Cn.shape[3])
            return tuple(out)

        for k in range(1, N):
            C = cores[k - 1]
            # Left-prefix Gram: the prefix interface is exactly orthonormal
            # after each edge's projection (U^T F^-1 Lk F^-T U = I), so the
            # L-weighting is the identity — a plain right-unfolding Gram,
            # one contiguous batched SYRK GEMM with no intermediate
            Lk = jnp.einsum("zaib,zaid->zbd", jnp.conj(C), C)
            X, Y = _factorize(C, G[k], Lk, k)
            r = _edge_rank(k)
            cores[k - 1] = jnp.einsum("zaib,zbc->zaic", C, X)
            nxt = cores[k]
            cores[k] = jnp.einsum(
                "zrb,zbj->zrj", Y, nxt.reshape(B, nxt.shape[1], -1)
            ).reshape(B, r, nxt.shape[2], nxt.shape[3])
        return tuple(cores)
