"""Inner products and statistics computed fully in compressed form.

Behavioral reference: /root/reference/tntorch/metrics.py:7-478. The core-chain
contraction in `dot` lowers to a chain of batched matmuls (MXU-shaped under
jit); all other metrics ride on it or on `ttm` rank-1 contractions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

import tntorch_tpu as tn
from tntorch_tpu.utils import asarray, matmul_precision


def _process(gt, approx):
    """Decompress if exactly one side is compressed (reference metrics.py:7-25).

    Beyond-parity: a batch-Tensor side decompresses to (B, ...) dense and
    flags batch=True, so the dense fallbacks in the callers reduce PER
    SAMPLE and return (B,) (the reference rejects batch here,
    metrics.py:18-23). The other dense side may be (B, ...) or unbatched
    (broadcast across the ensemble)."""
    is1 = isinstance(gt, tn.Tensor)
    is2 = isinstance(approx, tn.Tensor)
    if is1 and is2:
        return gt, approx, False  # compressed-compressed: dot is batch-native
    batch = (is1 and gt.batch) or (is2 and approx.batch)
    if is1:
        gt = gt.full()
    if is2:
        approx = approx.full()
    if not is1:
        gt = asarray(gt)
    if not is2:
        approx = asarray(approx)
    if batch:
        gt, approx = jnp.broadcast_arrays(gt, approx)
    return gt, approx, batch


def _flat(x, batch):
    """Flatten for dense reductions: fully, or per-sample to (B, -1)."""
    return x.reshape(x.shape[0], -1) if batch else x.reshape(-1)


def dot(t1, t2, k=None):
    """Generalized dot: contract the k leading dims (reference metrics.py:28-116).

    The contraction chain runs at the policy's matmul precision (exact under
    the default 'highest' policy — on TPU the ambient default would be
    single-pass bf16, ~1e-3 noise per contraction)."""
    with jax.default_matmul_precision(matmul_precision()):
        return _dot_impl(t1, t2, k)


def _dot_impl(t1, t2, k=None):
    t1, t2, dbatch = _process(t1, t2)
    if not isinstance(t1, tn.Tensor) and not isinstance(t2, tn.Tensor):
        return jnp.sum(_flat(t1, dbatch) * _flat(t2, dbatch), axis=-1)

    # Batch layout adds a leading B axis to every core/factor; the ellipsis
    # einsums below serve both layouts with one code path (the reference has
    # no batch dot at all). TT cores are ndim 3+b, CP factors 2+b.
    batch = t1.batch or t2.batch
    if t1.batch != t2.batch:
        raise ValueError("Cannot dot a batch tensor with a non-batch tensor")
    tt_ndim = 4 if batch else 3

    def _project_spatial(core, M):
        if core.ndim == tt_ndim:
            return jnp.einsum("...iak,...aj->...ijk", core, M)
        return jnp.einsum("...ak,...aj->...jk", core, M)

    def _project_left(core, M):
        if core.ndim == tt_ndim:
            return jnp.einsum("...sr,...rai->...sai", M, core)
        return jnp.einsum("...sr,...ar->...sar", M, core)

    Lprod = jnp.ones((int(t2.ranks_tt[0]), int(t1.ranks_tt[0])), dtype=t1.cores[0].dtype)
    if k is None:
        k = min(t1.dim(), t2.dim())
    assert k <= t1.dim() and k <= t2.dim()
    off = 1 if batch else 0
    if not np.array_equal(t1.shape[off:off + k], t2.shape[off:off + k]):
        raise ValueError(
            "Dot product requires leading dimensions to be equal, but they are {} and {}".format(
                t1.shape[off:off + k], t2.shape[off:off + k]
            )
        )

    for mu in range(k):
        core1 = t1.cores[mu]
        core2 = t2.cores[mu]
        # Absorb Tucker factors
        if t1.Us[mu] is None:
            if t2.Us[mu] is not None:
                core1 = _project_spatial(core1, t2.Us[mu])
        elif t2.Us[mu] is None:
            core2 = _project_spatial(core2, t1.Us[mu])
        else:
            core2 = _project_spatial(
                core2, jnp.einsum("...as,...ar->...sr", t2.Us[mu], t1.Us[mu])
            )
        # Advance the running left product
        Ucore = _project_left(core1, Lprod)
        Vcore = core2
        if Vcore.ndim == tt_ndim:
            Lprod = jnp.einsum("...sai,...saj->...ij", Vcore, Ucore)
        else:
            Lprod = jnp.einsum("...as,...sar->...sr", Vcore, Ucore)

    if k == t1.dim() and k == t2.dim():
        # Full contraction: per-sample (B,) values for batch, a scalar else
        return jnp.sum(Lprod, axis=(-2, -1)) if batch else jnp.sum(Lprod)

    # Partial-k: fold Lprod into the trailing cores (batch-aware — the
    # reference has neither batch dot nor batch partial dot)
    if k < t1.dim():
        t1trail = tn.Tensor(list(t1.cores[k:]), list(t1.Us[k:]), batch=batch)
        t1trail.cores[0] = _project_left(t1trail.cores[0], Lprod)
        if k == t2.dim():
            return t1trail
        t2trail = tn.Tensor(list(t2.cores[k:]), list(t2.Us[k:]), batch=batch)
        t1trail = tn.transpose(t1trail)
        return tn.Tensor(
            t1trail.cores + t2trail.cores, Us=t1trail.Us + t2trail.Us, batch=batch
        )
    t2trail = tn.Tensor(list(t2.cores[k:]), list(t2.Us[k:]), batch=batch)
    t2trail.cores[0] = _project_left(t2trail.cores[0], jnp.swapaxes(Lprod, -1, -2))
    return t2trail


def _is_complex(t):
    return isinstance(t, tn.Tensor) and any(jnp.iscomplexobj(c) for c in t.cores)


def _conj(t):
    """Tensor with conjugated cores/factors (conj distributes over the TT
    contraction, so full(_conj(t)) == conj(full(t)))."""
    t2 = t.clone()
    t2.cores = [jnp.conj(c) for c in t2.cores]
    t2.Us = [None if U is None else jnp.conj(U) for U in t2.Us]
    return t2


def _normsq_hermitian(t):
    """<t, t> with conjugation — real and nonnegative for complex tensors.

    `dot` itself stays unconjugated like the reference's einsum chain
    (metrics.py:93-98), but norms/distances must be true norms."""
    return jnp.clip(dot(_conj(t), t).real, min=0)


def dist(t1, t2):
    """Euclidean distance in compressed form (reference metrics.py:119-132).
    Batch input (either a batch Tensor or (B, ...) dense) returns (B,)."""
    t1, t2, dbatch = _process(t1, t2)
    if not isinstance(t1, tn.Tensor) and not isinstance(t2, tn.Tensor):
        return jnp.linalg.norm(_flat(t1 - t2, dbatch), axis=-1)
    if _is_complex(t1) or _is_complex(t2):
        cross = dot(_conj(t1), t2).real
        return jnp.sqrt(
            jnp.clip(_normsq_hermitian(t1) + _normsq_hermitian(t2) - 2 * cross, min=0)
        )
    return jnp.sqrt(jnp.clip(dot(t1, t1) + dot(t2, t2) - 2 * dot(t1, t2), min=0))


def relative_error(gt, approx):
    """||gt - approx|| / ||gt|| fully in compressed form (reference
    metrics.py:135-151). Batch input returns per-sample errors (B,)."""
    gt, approx, dbatch = _process(gt, approx)
    if not isinstance(gt, tn.Tensor) and not isinstance(approx, tn.Tensor):
        return jnp.linalg.norm(_flat(gt - approx, dbatch), axis=-1) / jnp.linalg.norm(
            _flat(gt, dbatch), axis=-1
        )
    if _is_complex(gt) or _is_complex(approx):
        return dist(gt, approx) / jnp.sqrt(_normsq_hermitian(gt))
    dotgt = dot(gt, gt)
    return jnp.sqrt(
        jnp.clip(dotgt + dot(approx, approx) - 2 * dot(gt, approx), min=0)
    ) / jnp.sqrt(jnp.clip(dotgt, min=0))


def rmse(gt, approx):
    """Root-mean-square error (reference metrics.py:154-167); (B,) for batch."""
    gt, approx, dbatch = _process(gt, approx)
    if not isinstance(gt, tn.Tensor) and not isinstance(approx, tn.Tensor):
        n = gt.size / gt.shape[0] if dbatch else gt.size
        return jnp.linalg.norm(_flat(gt - approx, dbatch), axis=-1) / np.sqrt(n)
    n = gt.numel() / (gt.shape[0] if gt.batch else 1)
    return dist(gt, approx) / np.sqrt(n)


def r_squared(gt, approx):
    """R^2 score (reference metrics.py:170-183); per-sample (B,) for batch."""
    gt, approx, dbatch = _process(gt, approx)
    if not isinstance(gt, tn.Tensor) and not isinstance(approx, tn.Tensor):
        gf, af = _flat(gt, dbatch), _flat(approx, dbatch)
        d = jnp.linalg.norm(gf - af, axis=-1)
        dm = jnp.linalg.norm(gf - jnp.mean(gf, axis=-1, keepdims=True), axis=-1)
        return 1 - d**2 / dm**2
    return 1 - dist(gt, approx) ** 2 / normsq(gt - mean(gt))


def sum(t, dim=None, keepdim=False, _normalize=False):
    """Sum over all or some modes via rank-1 contractions (reference metrics.py:186-220).

    Unlike the reference (which rejects batch tensors, metrics.py:18-23),
    batch input is supported: `dim` counts modes (the leading batch axis is
    never reduced) and a full reduction returns a per-sample (B,) array."""
    if dim is None:
        dim = np.arange(t.dim())
    if not hasattr(dim, "__len__"):
        dim = [dim]
    dim = [d + t.dim() if d < 0 else int(d) for d in dim]
    off = 1 if t.batch else 0
    dtype = t.cores[0].dtype
    sizes = [t.shape[d + off] for d in dim]
    if _normalize:
        us = [jnp.ones(s, dtype=dtype) / s for s in sizes]
    else:
        us = [jnp.ones(s, dtype=dtype) for s in sizes]
    result = tn.ttm(t, us, dim)
    if keepdim:
        return result
    if t.batch:
        # Squeeze exactly the reduced modes (an unrelated singleton mode
        # must survive a partial reduction); squeeze counts MODES
        return tn.squeeze(result, dim=dim)
    return tn.squeeze(result)


def mean(t, dim=None, marginals=None, keepdim=False):
    """Mean over modes, optionally weighted by marginal PMFs (reference metrics.py:223-244)."""
    if marginals is not None:
        if dim is None:
            dim = range(t.dim())
        if not hasattr(dim, "__len__"):
            dim = [dim]
        dim = [d + t.dim() if d < 0 else int(d) for d in dim]
        # Expectation weights apply only to the REDUCED modes (the reference
        # put uniform 1/sh weights on unreduced modes too, silently scaling
        # partial means, reference metrics.py:236-242); modes in `dim`
        # beyond the provided marginals stay uniform.
        off = 1 if t.batch else 0
        pdfcores = [
            jnp.ones((1, sh, 1), dtype=t.cores[0].dtype) / (sh if n in dim else 1)
            for n, sh in enumerate(t.shape[off:])
        ]
        for d, marg in zip(dim, marginals):
            marg = asarray(marg)
            # (I,) shared across the batch, or (B, I) per-sample weights
            w = marg / jnp.sum(marg, axis=-1, keepdims=True)
            pdfcores[d] = w[..., None, :, None]
        if t.batch:
            B = t.shape[0]
            pdfcores = [
                jnp.broadcast_to(c, (B,) + c.shape[-3:]) for c in pdfcores
            ]
        pdf = tn.Tensor(pdfcores, batch=t.batch)
        return sum(t * pdf, dim, keepdim)
    return sum(t, dim, keepdim, _normalize=True)


def var(t, marginals=None):
    """Variance (reference metrics.py:247-263). Batch tensors return a
    per-sample (B,) array (beyond-parity; the reference rejects batch)."""
    if marginals is not None:
        assert len(marginals) == t.dim()
        tcentered = t - mean(t, marginals=marginals)
        pdfcores = []
        for m in marginals:
            m = asarray(m)
            w = m / jnp.sum(m, axis=-1, keepdims=True)
            pdfcores.append(w[..., None, :, None])
        if t.batch:
            B = t.shape[0]
            pdfcores = [jnp.broadcast_to(c, (B,) + c.shape[-3:]) for c in pdfcores]
        pdf = tn.Tensor(pdfcores, batch=t.batch)
        return dot(tcentered * pdf, tcentered)
    n = t.numel() / (t.shape[0] if t.batch else 1)  # per-sample element count
    return normsq(t - mean(t)) / n


def std(t):
    """Standard deviation, sqrt(var) (reference metrics.py:263-276)."""
    return jnp.sqrt(var(t))


def skew(t):
    """Skewness via cross-approximated powers (reference metrics.py:278-287)."""
    return mean(((t - mean(t)) / std(t)) ** 3)


def kurtosis(t, fisher=True):
    """Kurtosis, Fisher (excess) by default (reference metrics.py:290-300)."""
    return mean(((t - mean(t)) / std(t)) ** 4) - fisher * 3


def raw_moment(t, k, marginals=None, eps=1e-6, algorithm="eig"):
    """E[t^k] via Hadamard-dot (reference metrics.py:303-319)."""
    if marginals is not None:
        pdfcores = []
        for m in marginals:
            m = asarray(m)
            w = m / jnp.sum(m, axis=-1, keepdims=True)
            pdfcores.append(w[..., None, :, None])
        if t.batch:
            B = t.shape[0]
            pdfcores = [jnp.broadcast_to(c, (B,) + c.shape[-3:]) for c in pdfcores]
        pdf = tn.Tensor(pdfcores, batch=t.batch)
        return hadamard_sum([t] * (k - 1) + [t * pdf], eps=eps, algorithm=algorithm)
    n = t.numel() / (t.shape[0] if t.batch else 1)  # per-sample element count
    return hadamard_sum([t] * k, eps=eps, algorithm=algorithm) / n


def normalized_moment(t, k, marginals=None, eps=1e-12, algorithm="eig"):
    """E[(t - E t)^k] / sigma^k (reference metrics.py:322-342)."""
    return raw_moment(
        t - mean(t, marginals=marginals), k=k, marginals=marginals, eps=eps, algorithm=algorithm
    ) / var(t, marginals=marginals) ** (k / 2.0)


def hadamard_sum(ts, algorithm="exact", eps=None):
    """Sum of the Hadamard product of M tensors: exact contraction or the
    MRF-style rounded algorithm (reference metrics.py:345-454).

    :param eps: rounding tolerance for the non-exact algorithms; defaults to
        1e-14 (`round_tt`'s own default) when omitted."""
    M = len(ts)
    if eps is None:
        eps = 1e-14

    def diag_core(c, m):
        # TT core (Rl x I x Rr) -> (I x Rl x Rr x I) with diagonal structure
        Rl, I, Rr = c.shape
        eye = jnp.eye(I, dtype=c.dtype)
        # core[a, i, j, b] = delta(a,b) * c[i, a, j]
        core = eye[:, None, None, :] * jnp.transpose(c, (1, 0, 2))[:, :, :, None]
        if m == 0:
            core = jnp.sum(core, axis=0, keepdims=True)
        if m == M - 1:
            core = jnp.sum(core, axis=-1, keepdims=True)
        return core

    def get_tensor(cores):
        cs = []
        for m in range(M):
            c = diag_core(cores[m], m)
            cs.append(c.reshape(c.shape[0], c.shape[1] * c.shape[2], c.shape[3]))
        t = tn.Tensor(cs)
        t.round_tt(eps, algorithm=algorithm)
        cs = t.cores
        return [
            cs[m].reshape(cs[m].shape[0], cores[m].shape[0], cores[m].shape[2], cs[m].shape[-1])
            for m in range(M)
        ]

    batch = ts[0].batch
    if any(t.batch != batch for t in ts):
        raise ValueError("Cannot mix batch and non-batch tensors in hadamard_sum")
    for i in range(1, len(ts)):
        if ts[0].shape != ts[i].shape:
            raise ValueError(
                f"hadamard_sum expects equal shapes (incl. batch size), got "
                f"{tuple(ts[i].shape)} vs {tuple(ts[0].shape)}"
            )
    if batch and algorithm != "exact":
        # The MRF algorithm rounds adaptively per mode (data-dependent
        # ranks), so samples run independently — same lift as batched cross.
        B = ts[0].cores[0].shape[0]
        vals = [
            hadamard_sum(
                [
                    tn.Tensor(
                        [c[b] for c in t.cores],
                        Us=[None if U is None else U[b] for U in t.Us],
                    )
                    for t in ts
                ],
                algorithm=algorithm,
                eps=eps,
            )
            for b in range(B)
        ]
        return jnp.stack([jnp.asarray(v) for v in vals])
    tstt = []
    for m in range(M):
        t = ts[m].decompress_tucker_factors()
        t._cp_to_tt()
        tstt.append(t)
    ts = tstt

    if algorithm == "exact":
        nested = tuple(tuple(t.cores) for t in ts)
        with jax.default_matmul_precision(matmul_precision()):
            if batch:
                # vmap the whole contraction over the batch axis of every
                # core: per-sample Hadamard-dot values, one XLA program
                return jax.vmap(_hadamard_sum_exact)(nested)
            return _hadamard_sum_exact(nested)

    N = ts[0].dim()
    if N == 1:
        # One mode: nothing to round along the chain — the exact contraction
        # IS the answer (the reference's loop-based body falls through and
        # returns None here, reference metrics.py:408-454)
        nested = tuple(tuple(t.cores) for t in ts)
        with jax.default_matmul_precision(matmul_precision()):
            return _hadamard_sum_exact(nested)
    thiscores = get_tensor([t.cores[0] for t in ts])
    for n in range(1, N):
        nextcores = get_tensor([t.cores[n] for t in ts])
        newcores = []
        for m in range(M):
            c = jnp.einsum("ijkl,akbc->iajblc", thiscores[m], nextcores[m])
            c = c.reshape(
                c.shape[0] * c.shape[1] * c.shape[2], c.shape[3], c.shape[4] * c.shape[5]
            )
            newcores.append(c)
        thiscores = tn.round_tt(tn.Tensor(newcores), eps=eps, algorithm=algorithm).cores
        if n < N - 1:
            thiscores = [
                tc.reshape(tc.shape[0], 1, tc.shape[1], -1) for tc in thiscores
            ]
        else:
            return tn.Tensor(thiscores).full().reshape(())


def _hadamard_sum_exact(core_lists):
    """Exact K-tensor Hadamard-dot on pure-TT core tuples (one 3-D core per
    mode per tensor). Takes plain arrays (not Tensor objects) so the batch
    path can jax.vmap it over a leading axis on every core."""
    K = len(core_lists)
    N = len(core_lists[0])
    core = jnp.ones([1] * K, dtype=core_lists[0][0].dtype)
    for n in range(N):
        B = core_lists[0][n].shape[1]
        core = jnp.tile(core[None], [B] + [1] * K)
        for i in range(K):
            neworder = [0, *list(np.delete(np.arange(1, K + 1), i)), i + 1]
            undo = list(np.argsort(neworder))
            unfolded = jnp.transpose(core, neworder)
            shape = list(unfolded.shape)
            unfolded = unfolded.reshape(B, -1, core.shape[i + 1])
            unfolded = jnp.matmul(unfolded, jnp.transpose(core_lists[i][n], (1, 0, 2)))
            shape[-1] = core_lists[i][n].shape[2]
            unfolded = unfolded.reshape(shape)
            core = jnp.transpose(unfolded, undo)
        core = jnp.sum(core, axis=0)
    return core.reshape(())


def normsq(t):
    """Squared Frobenius norm <t, t> (reference metrics.py:455-466)."""
    if _is_complex(t):
        return _normsq_hermitian(t)
    return dot(t, t)


def norm(t):
    """Frobenius norm (reference metrics.py:469-480); Hermitian for complex cores."""
    if _is_complex(t):
        return jnp.sqrt(_normsq_hermitian(t))
    return jnp.sqrt(jnp.clip(normsq(t), min=0))
