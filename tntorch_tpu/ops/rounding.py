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


def _left_orthogonalize_sweep(cores):
    """QR sweep making cores 0..N-2 left-orthogonal (traceable, static shapes)."""
    cores = list(cores)
    N = len(cores)
    for mu in range(N - 1):
        Rl, I, Rr = cores[mu].shape
        Q, R = jnp.linalg.qr(cores[mu].reshape(Rl * I, Rr))
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
        # Top-r left singular subspace via the (small) Gram matrix
        G = M @ M.T
        _, V = jnp.linalg.eigh(G)  # ascending
        U = V[:, ::-1][:, :r]  # (Rl, r)
        cores[mu] = (U.T @ M).reshape(r, I, Rr)
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


def _sqrt_factor(G, eps_rel=1e-12):
    """Symmetric PSD square-root factor F (G = F F^T) and its inverse-transpose
    action, via eigh (robust to semi-definiteness, unlike Cholesky)."""
    w, V = jnp.linalg.eigh(G)
    w = jnp.maximum(w, eps_rel * jnp.max(jnp.abs(w)))
    s = jnp.sqrt(w)
    F = V * s[None, :]          # G = F F^T
    Finv = V / s[None, :]       # F^{-T} = Finv (since F^T = s V^T)
    return F, Finv


@partial(jax.jit, static_argnums=(1,))
def round_tt_gram(cores: Sequence[jax.Array], rmax: int):
    """Fixed-rank TT rounding WITHOUT orthogonalization sweeps: two-sided
    Gram method (cf. Al Daas, Ballard et al., "Parallel TT rounding based on
    Gram SVD"). Every large operation is a batched matmul (MXU); the only
    dense factorizations are eigh/SVD on small R x R matrices.

    Numerics: like algorithm='eig', the Gram squares the condition number —
    use for f32/bf16 performance mode; the QR path (round_tt_fixed) is the
    accuracy-first variant.
    """
    with jax.default_matmul_precision("highest"):
        return _round_tt_gram_body(cores, rmax)


def _round_tt_gram_body(cores, rmax):
    cores = list(cores)
    N = len(cores)
    dtype = cores[0].dtype

    # Right Gram chain over the untouched suffix: G[k] = Gram of cores k+1..N
    G = [None] * (N + 1)
    G[N] = jnp.ones((1, 1), dtype=dtype)
    for k in range(N, 1, -1):
        C = cores[k - 1]  # (Rl, I, Rr)
        T = jnp.einsum("aib,bc->aic", C, G[k])
        G[k - 1] = jnp.einsum("aic,dic->ad", T, C)

    # Left sweep: truncate each interior edge via small symmetric eigenproblems
    from jax.scipy.linalg import solve_triangular

    L = jnp.ones((1, 1), dtype=dtype)
    for k in range(1, N):
        C = cores[k - 1]
        # Left Gram of the prefix ending at edge k
        Lk = jnp.einsum("aib,ac,cid->bd", C, L, C)
        # Cholesky square root with relative jitter (PSD, possibly singular)
        jitter = 1e-7 * jnp.trace(Lk) / Lk.shape[0] + jnp.asarray(1e-30, dtype)
        F = jnp.linalg.cholesky(Lk + jitter * jnp.eye(Lk.shape[0], dtype=dtype))  # lower
        # Edge Gram in the orthonormalized prefix basis: A = F^T G F;
        # its top-r eigenvectors U_r are the left singular vectors of the
        # middle matrix S = F^T H (A = S S^T) — no SVD needed.
        A = F.T @ G[k] @ F
        _, V = jnp.linalg.eigh(A)  # ascending
        rk = rmax if isinstance(rmax, int) else rmax[k - 1]
        r = min(rk, A.shape[0])
        U = V[:, ::-1][:, :r]
        # X = F^{-T} U_r right-multiplies C_k; Y = U_r^T F^T = X^T Lk pushes
        # the middle factor into C_{k+1}
        X = solve_triangular(F, U, trans=1, lower=True)
        Y = U.T @ F.T
        cores[k - 1] = jnp.einsum("aib,bc->aic", C, X)
        nxt = cores[k]
        cores[k] = (Y @ nxt.reshape(nxt.shape[0], -1)).reshape(r, nxt.shape[1], nxt.shape[2])
        # New left interface P~ U_r is orthonormal
        L = jnp.eye(r, dtype=dtype)
    return cores


@jax.jit
def _round_tt_eps_kernel(cores, eps, rmax_vec):
    """Error-budgeted (adaptive-rank) TT rounding as ONE jitted program.

    XLA needs static shapes, so truncation is a *masked projection*: each
    edge keeps its padded rank but zeroes the discarded spectral directions,
    and the data-dependent effective ranks come back as a small int vector —
    the only host sync. The caller compacts the padded cores outside jit
    (SURVEY.md hard part #1: padded-rank + mask discipline).

    Rank rule matches the reference's reversed-cumsum criterion
    (round.py:147-158) with delta = eps * |t| / sqrt(N-1) (tensor.py:2039);
    spectra come from the Gram matrix like algorithm='eig'.
    """
    with jax.default_matmul_precision("highest"):
        cores = _left_orthogonalize_sweep(list(cores))
        N = len(cores)
        dtype = cores[0].dtype
        norm = jnp.linalg.norm(cores[-1].reshape(-1))
        delta = eps / max(1.0, float(np.sqrt(N - 1))) * norm
        effs = []
        for mu in range(N - 1, 0, -1):
            Rl, I, Rr = cores[mu].shape
            M = cores[mu].reshape(Rl, I * Rr)
            G = M @ M.T
            w, V = jnp.linalg.eigh(G)  # ascending; w == sigma^2
            w = jnp.maximum(w, 0.0)
            k_discard = jnp.sum(jnp.cumsum(w) <= delta**2)
            r = jnp.clip(Rl - k_discard, 1, rmax_vec[mu - 1])
            mask = (jnp.arange(Rl) < r).astype(dtype)
            U = V[:, ::-1] * mask[None, :]  # zero the discarded directions
            s = jnp.sqrt(jnp.maximum(w[::-1], jnp.finfo(dtype).tiny))  # sigma, descending
            # Keep the invariant of the RTL sweep: core_mu gets the
            # row-orthonormal V^T (scale sigma pushed LEFT), so the next
            # edge's Gram spectrum still measures the global error
            cores[mu] = (((U.T @ M) / s[:, None]) * mask[:, None]).reshape(Rl, I, Rr)
            prev = cores[mu - 1]
            cores[mu - 1] = jnp.einsum("ijk,kl->ijl", prev, U * s[None, :])
            effs.append(r)
        return cores, jnp.stack(effs[::-1]).astype(jnp.int32)


def round_tt_eps(cores, eps: float, rmax=None):
    """Adaptive-rank TT rounding with a single device->host sync: run the
    jitted masked-truncation kernel, then compact the padded cores to the
    effective ranks on the host. Returns a list of compacted cores."""
    cores = tuple(cores)
    N = len(cores)
    if rmax is None:
        rmax = [np.iinfo(np.int32).max] * (N - 1)
    elif not hasattr(rmax, "__len__"):
        rmax = [rmax] * (N - 1)
    rmax_vec = jnp.asarray(
        [np.iinfo(np.int32).max if r is None else int(r) for r in rmax], dtype=jnp.int32
    )
    padded, effs = _round_tt_eps_kernel(cores, jnp.asarray(eps, cores[0].dtype), rmax_vec)
    effs = [1] + [int(e) for e in np.asarray(effs)] + [1]  # the one sync
    return [c[: effs[k], :, : effs[k + 1]] for k, c in enumerate(padded)]


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
