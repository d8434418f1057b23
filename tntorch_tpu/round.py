"""Functional rounding wrappers and the truncated-SVD kernel.

Behavioral reference: /root/reference/tntorch/round.py:7-187. The SVD /
Gram-eigh factorizations run batched on device (JAX linalg broadcasts over
leading axes, replacing the reference's per-branch batch code); only the
data-dependent rank choice syncs singular values to the host, since XLA
needs static output shapes.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from tntorch_tpu.utils import policy_precision as _policy_precision


def round_tt(t, **kwargs):
    """Copy-and-round via Tensor.round_tt (reference round.py:7-19)."""
    t2 = t.clone()
    t2.round_tt(**kwargs)
    return t2


def round_tucker(t, **kwargs):
    """Functional Tucker-rank rounding (reference round.py:9-29)."""
    t2 = t.clone()
    t2.round_tucker(**kwargs)
    return t2


def round(t, **kwargs):
    """Functional combined TT+Tucker rounding (reference round.py:52-69)."""
    t2 = t.clone()
    t2.round(**kwargs)
    return t2


@_policy_precision
def truncated_svd(
    M,
    delta: Optional[float] = None,
    eps: Optional[float] = None,
    rmax: Optional[int] = None,
    left_ortho: bool = True,
    algorithm: str = "svd",
    verbose: bool = False,
    batch: bool = False,
):
    """Factor M (m x n, or B x m x n when batch) into U (m x r) @ V (r x n)
    with error-budgeted rank choice (reference round.py:52-187).

    - delta: absolute error norm budget; eps: relative budget (exclusive).
    - algorithm 'svd' uses a singular value decomposition; 'eig' forms the
      Gram matrix of the short side and eigen-decomposes it (faster, less
      accurate; negative eigenvalues clamped to 1e-8 as in the reference).
    - batch picks ONE shared rank: the max over samples of each sample's
      error-budgeted rank (relative `eps` budgets are per-sample norms), so
      every sample meets its budget at a common shape.
    """
    if delta is not None and eps is not None:
        raise ValueError("Provide either `delta` or `eps`")
    eps_rel = eps if (eps is not None and batch) else None
    if delta is None and eps is not None and not batch:
        delta = eps * float(jnp.linalg.norm(M.reshape(-1)))
    if delta is None:
        delta = 0.0
    if rmax is None:
        rmax = np.iinfo(np.int32).max
    rmax = int(rmax)
    assert rmax >= 1
    assert algorithm in ("svd", "eig")

    if algorithm == "svd":
        U, S, _ = jnp.linalg.svd(M, full_matrices=False)
        svd0, svd1 = U, S
        singular_vectors = "left"
    else:
        # Gram of the short side; conjugated so eigh gets a Hermitian matrix
        # for complex input (the reference's plain transpose silently
        # selects a wrong subspace for complex data)
        if M.shape[-2] <= M.shape[-1]:
            gram = M @ jnp.swapaxes(M, -1, -2).conj()
            singular_vectors = "left"
        else:
            gram = jnp.swapaxes(M, -1, -2).conj() @ M
            singular_vectors = "right"
        w, v = jnp.linalg.eigh(gram)
        # Clamp roundoff negatives to ZERO: the reference's absolute 1e-8
        # clamp inflates exact-zero directions above tight error budgets, so
        # rank-deficient input was never truncated at small eps. Division by
        # the resulting zero sigmas is guarded at the use sites below.
        w = jnp.sqrt(jnp.maximum(w, 0.0))
        svd0 = v[..., ::-1]  # descending eigenvalue order
        svd1 = w[..., ::-1]

    S_host = np.asarray(svd1)

    # Zero matrix -> rank-1 zero factors (reference round.py:137-145)
    if batch:
        if S_host.max() < 1e-13:
            return (
                jnp.zeros((M.shape[0], M.shape[1], 1), dtype=M.dtype),
                jnp.zeros((M.shape[0], 1, M.shape[2]), dtype=M.dtype),
            )
    else:
        if S_host[0] < 1e-13:
            return (
                jnp.zeros((M.shape[0], 1), dtype=M.dtype),
                jnp.zeros((1, M.shape[1]), dtype=M.dtype),
            )

    if batch:
        S2b = S_host.astype(np.float64) ** 2  # (B, K)
        if eps_rel is not None or delta > 0:
            # Per-sample largest discardable tail (sum of smallest sigma^2
            # within budget); the shared rank is the max a sample needs.
            # Frobenius^2 == sum of ALL sigma^2 (full_matrices=False keeps
            # every singular value), so relative budgets need no extra sync.
            tails = np.cumsum(S2b[:, ::-1], axis=1)
            if eps_rel is not None:
                budget2 = (eps_rel**2) * S2b.sum(axis=1, keepdims=True)
            else:
                budget2 = np.full((S2b.shape[0], 1), float(delta) ** 2)
            discardable = (tails <= budget2).sum(axis=1)
            rank = max(1, min(rmax, int((S2b.shape[1] - discardable).max())))
        else:
            rank = max(1, min(rmax, S_host.shape[-1]))
    else:
        # Largest discardable tail: sum of smallest sigma^2 <= delta^2
        S2 = S_host.astype(np.float64) ** 2
        tail = np.cumsum(S2[::-1])
        where = np.where(tail <= delta**2)[0]
        if len(where) == 0:
            rank = max(1, min(rmax, len(S2)))
        else:
            rank = max(1, min(rmax, len(S2) - 1 - int(where[-1])))

    left = svd0[..., :rank]
    sr = svd1[..., :rank]
    # Zero sigmas can be KEPT when rmax/delta forces the rank above the true
    # rank; their directions carry no data, so a guarded reciprocal (0 -> 0
    # contribution) is exact where the reference's 1e-8 clamp was noise
    tiny = jnp.finfo(svd1.dtype).tiny
    sr_inv = jnp.where(sr > tiny, 1.0 / jnp.where(sr > tiny, sr, 1.0), 0.0)

    if singular_vectors == "left":
        if left_ortho:
            M2 = jnp.swapaxes(left, -1, -2).conj() @ M
        else:
            M2 = sr_inv[..., None] * (jnp.swapaxes(left, -1, -2).conj() @ M)
            left = left * sr[..., None, :]
    else:
        if left_ortho:
            M2 = M @ (left * sr_inv[..., None, :])
            left, M2 = M2, jnp.swapaxes(left * sr[..., None, :], -1, -2).conj()
        else:
            M2 = M @ left
            left, M2 = M2, jnp.swapaxes(left, -1, -2).conj()

    return left, M2
