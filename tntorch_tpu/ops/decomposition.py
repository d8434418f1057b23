"""Jit-compiled dense -> TT decomposition kernels.

The reference's TT-SVD (tensor.py:2008-2083 via _full_rank_tt + round_tt)
builds an exact full-rank TT and then rounds it — O(I^{N}) SVD work with
host-side rank decisions per mode. For a *fixed* target rank the whole
decomposition can instead run as one XLA program:

- `tt_svd_randomized`: Halko-Martinsson-Tropp randomized range finder per
  unfolding (matmul sketch + tall-skinny QR + small Gram eigh) — the
  standard TPU-shaped truncated SVD; FLOPs are almost entirely MXU matmuls.
- `tt_svd_gram`: deterministic variant using the Gram matrix of the short
  side (exact up to f32 conditioning, no randomness).

Both return cores with static shapes given `ranks`, so they compile once
per (shape, ranks) bucket.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _cap_ranks(shape, rmax) -> Tuple[int, ...]:
    """Clip target ranks to the exact TT ranks of the shape."""
    N = len(shape)
    if not hasattr(rmax, "__len__"):
        rmax = [rmax] * (N - 1)
    ranks = [1]
    for k in range(1, N):
        full = min(int(np.prod(shape[:k])), int(np.prod(shape[k:])))
        # Monotone chain cap r_k <= r_{k-1} * I_{k-1}: the mode-k unfolding
        # has only r_{k-1} * I_{k-1} rows, so a larger target rank would
        # make the kernels' U.reshape(r_prev, I, r) impossible
        ranks.append(min(int(rmax[k - 1]), full, ranks[-1] * int(shape[k - 1])))
    ranks.append(1)
    return tuple(ranks)


@partial(jax.jit, static_argnums=(1, 3, 4))
def _tt_svd_randomized(data, ranks, key, oversample: int = 8, n_iter: int = 1):
    # TPU default matmul precision is bf16; Gram/sketch products need f32
    with jax.default_matmul_precision("highest"):
        return _tt_svd_randomized_body(data, ranks, key, oversample, n_iter)


def _tt_svd_randomized_body(data, ranks, key, oversample, n_iter):
    shape = data.shape
    N = len(shape)
    dtype = data.dtype
    cores = []
    M = data.reshape(shape[0], -1)
    r_prev = 1
    for k in range(N - 1):
        r = ranks[k + 1]
        m, n = M.shape
        p = min(r + oversample, m, n)
        key, sub = jax.random.split(key)
        omega = jax.random.normal(sub, (n, p), dtype=dtype)
        Y = M @ omega
        for _ in range(n_iter):  # power iteration for spectral accuracy
            Y = M @ (M.T @ Y)
        Q, _ = jnp.linalg.qr(Y)  # (m, p) tall-skinny
        B = Q.T @ M  # (p, n)
        # Top-r left singular vectors of B via its small Gram matrix
        G = B @ B.T
        _, V = jnp.linalg.eigh(G)
        U = V[:, ::-1][:, :r]  # (p, r)
        core = (Q @ U).reshape(r_prev, shape[k], r)
        cores.append(core)
        M = (U.T @ B).reshape(r * shape[k + 1], -1)
        r_prev = r
    cores.append(M.reshape(r_prev, shape[N - 1], 1))
    return cores


def tt_svd_randomized(data, rmax, key=None, oversample: int = 8, n_iter: int = 1):
    """Randomized fixed-rank TT-SVD of a dense array (one XLA program)."""
    from tntorch_tpu.utils import next_key

    ranks = _cap_ranks(data.shape, rmax)
    if key is None:
        key = next_key()
    return _tt_svd_randomized(data, ranks, key, oversample, n_iter)


@partial(jax.jit, static_argnums=(1,))
def _tt_svd_gram(data, ranks):
    # TPU default matmul precision is bf16; Gram products need f32
    with jax.default_matmul_precision("highest"):
        return _tt_svd_gram_body(data, ranks)


def _tt_svd_gram_body(data, ranks):
    shape = data.shape
    N = len(shape)
    cores = []
    M = data.reshape(shape[0], -1)
    r_prev = 1
    for k in range(N - 1):
        r = ranks[k + 1]
        m, n = M.shape
        if m <= n:
            G = M @ M.T  # (m, m)
            _, V = jnp.linalg.eigh(G)
            U = V[:, ::-1][:, :r]  # (m, r)
        else:
            G = M.T @ M  # (n, n)
            _, V = jnp.linalg.eigh(G)
            W = V[:, ::-1][:, :r]  # right vectors
            U = M @ W  # un-normalized left vectors
            U = U / jnp.maximum(jnp.linalg.norm(U, axis=0, keepdims=True), 1e-30)
        cores.append(U.reshape(r_prev, shape[k], r))
        M = (U.T @ M).reshape(r * shape[k + 1], -1)
        r_prev = r
    cores.append(M.reshape(r_prev, shape[N - 1], 1))
    return cores


def tt_svd_gram(data, rmax):
    """Deterministic Gram-based fixed-rank TT-SVD (one XLA program)."""
    ranks = _cap_ranks(data.shape, rmax)
    return _tt_svd_gram(data, ranks)
