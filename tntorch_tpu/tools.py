"""NumPy-like manipulation and multilinear algebra on compressed tensors.

Behavioral reference: /root/reference/tntorch/tools.py:14-698.
"""

from __future__ import annotations

import time
import jax
import jax.numpy as jnp
import numpy as np

import tntorch_tpu as tn
from tntorch_tpu.utils import asarray, default_dtype, matmul_precision

"""
Array-like manipulations
"""


def squeeze(t, dim=None):
    """Remove singleton dimensions (reference tools.py:14-34). `dim` counts
    MODES; a batch tensor's leading batch axis is never squeezed (even at
    B == 1 — dropping it would silently change batchness)."""
    off = 1 if t.batch else 0
    mode_shape = list(t.shape)[off:]
    if dim is None:
        dim = np.where([s == 1 for s in mode_shape])[0]
    if not hasattr(dim, "__len__"):
        dim = [dim]
    dim = [d + t.dim() if d < 0 else d for d in dim]
    assert np.all(np.array(mode_shape)[list(dim)] == 1)
    idx = [slice(None) for _ in range(t.dim() + off)]
    for m in dim:
        idx[m + off] = 0
    return t[tuple(idx)]


def unsqueeze(t, dim):
    """Insert singleton dimensions (reference tools.py:37-53). `dim` counts
    MODES; for batch tensors the accessor key needs a leading batch slot
    (without it, the first entry would be read as a batch index)."""
    if not hasattr(dim, "__len__"):
        dim = [dim]
    off = 1 if t.batch else 0
    idx: list = [slice(None) for _ in range(t.dim() + off + len(dim))]
    for d in dim:
        idx[d + off] = None
    return t[tuple(idx)]


def cat(*ts, dim):
    """Concatenate along a mode via zero-padding + rank-sum add (reference tools.py:56-104)."""
    if hasattr(ts[0], "__len__"):
        ts = ts[0]
    if len(ts) == 1:
        return ts[0].clone()
    if dim < 0:
        dim += ts[0].dim()
    off = 1 if ts[0].batch else 0  # t.shape carries the batch size up front
    if any(
        any(
            t.shape[n + off] != ts[0].shape[n + off]
            for n in np.delete(range(ts[0].dim()), dim)
        )
        for t in ts[1:]
    ):
        raise ValueError(
            "To concatenate tensors, all must have the same shape along all but the given dim"
        )

    shapes = np.array([t.shape[dim + off] for t in ts])
    sumshapes = np.concatenate([np.array([0]), np.cumsum(shapes)])
    result = None
    for i in range(len(ts)):
        t = ts[i].clone()
        if t.Us[dim] is None:
            c = t.cores[dim]
            # Zero-pad along the mode axis (always axis -2) — covers 2D/3D
            # CP, 3D/4D TT, batch or not
            z = jnp.zeros(c.shape[:-2] + (sumshapes[-1], c.shape[-1]), dtype=c.dtype)
            t.cores[dim] = z.at[..., sumshapes[i]:sumshapes[i + 1], :].add(c)
        else:
            U = t.Us[dim]
            z = jnp.zeros(U.shape[:-2] + (sumshapes[-1], U.shape[-1]), dtype=U.dtype)
            t.Us[dim] = z.at[..., sumshapes[i]:sumshapes[i + 1], :].add(U)
        result = t if result is None else result + t
    return result


def transpose(t):
    """Reverse mode order (reference tools.py:107-132; batch layout keeps
    its leading B axis in place and swaps only the rank axes)."""
    off = 1 if t.batch else 0
    cores, Us, idxs = [], [], []
    if off:
        try:
            idxs.append(np.asarray(t.idxs[0]).copy())
        except Exception:
            idxs.append(None)
    for n in range(t.dim() - 1, -1, -1):
        c = t.cores[n]
        if c.ndim == 3 + off:  # TT core: swap left/right ranks
            cores.append(jnp.transpose(c, (0, 3, 2, 1) if off else (2, 1, 0)))
        else:  # CP factor: symmetric in its rank index
            cores.append(c)
        Us.append(None if t.Us[n] is None else t.Us[n])
        try:
            idxs.append(np.asarray(t.idxs[n + off]).copy())
        except Exception:
            idxs.append(None)
    return tn.Tensor(cores, Us, idxs, batch=t.batch)


def meshgrid(*axes, batch: bool = False):
    """N rank-1-per-mode tensors spanning a grid (reference tools.py:135-166)."""
    if not hasattr(axes, "__len__"):
        axes = [axes]
    if hasattr(axes[0], "__len__"):
        axes = axes[0]
    axes = list(axes)
    N = len(axes)
    dtype = default_dtype()
    for n in range(N):
        if not hasattr(axes[n], "__len__"):
            axes[n] = jnp.arange(axes[n], dtype=dtype)
        else:
            axes[n] = asarray(axes[n], dtype=dtype)

    # One jitted program builds all cores; the rank-1 "ones" cores are shared
    # across the N output tensors (JAX arrays are immutable), so construction
    # costs a single dispatch rather than N^2 eager ops.
    ones_cores, val_cores = _meshgrid_cores(tuple(axes))
    tensors = []
    for n in range(N):
        cores = list(ones_cores)
        cores[n] = val_cores[n]
        tensors.append(tn.Tensor(cores, batch=batch))
    return tensors


@jax.jit
def _meshgrid_cores(axes):
    ones_cores = tuple(jnp.ones((1, ax.shape[0], 1), dtype=ax.dtype) for ax in axes)
    val_cores = tuple(ax[None, :, None] for ax in axes)
    return ones_cores, val_cores


def flip(t, dim):
    """Reverse order along modes (reference tools.py:169-190). `dim` counts
    MODES; mode sizes live at t.shape[off + d] for batch tensors, and the
    mode axis of every core/factor layout is axis -2."""
    if not hasattr(dim, "__len__"):
        dim = [dim]
    off = 1 if t.batch else 0
    result = t.clone()
    for d in dim:
        if d < 0:
            d += t.dim()
        idx = np.arange(t.shape[d + off] - 1, -1, -1)
        if result.Us[d] is not None:
            result.Us[d] = result.Us[d][..., idx, :]
        else:
            result.cores[d] = result.cores[d][..., idx, :]
    return result


def unbind(t, dim):
    """Slice a tensor along a mode into a list (reference tools.py:193-208).
    Batch tensors yield batch slices: the accessor key carries a leading
    batch slot so the mode integer is not read as a batch index."""
    if dim < 0:
        dim += t.dim()
    off = 1 if t.batch else 0
    return [
        t[tuple([slice(None)] * (dim + off) + [sl] + [slice(None)] * (t.dim() - 1 - dim))]
        for sl in range(t.shape[dim + off])
    ]


def stack(ts):
    """Stack non-batch tensors of equal shape into one batch Tensor.

    Beyond-parity ensemble constructor (the reference has no counterpart):
    each sample is converted to plain TT form and the samples are stacked
    along a new leading batch axis at zero-padded common ranks, so
    ensembles with heterogeneous per-sample ranks are fine.  The inverse
    (batch -> list of samples) is ``[t[b] for b in range(B)]``.
    """
    ts = list(ts)
    if not ts:
        raise ValueError("stack expects at least one tensor")
    if any(t.batch for t in ts):
        raise ValueError("stack expects non-batch tensors (already-batched input)")
    shape = tuple(ts[0].shape)
    for t in ts[1:]:
        if tuple(t.shape) != shape:
            raise ValueError(f"stack expects equal shapes, got {tuple(t.shape)} vs {shape}")
    ts = [t.tt() for t in ts]
    N = len(shape)
    redges = [[int(r) for r in t.ranks_tt] for t in ts]  # each: N+1 entries
    rmaxs = [max(re[k] for re in redges) for k in range(N + 1)]
    bcores = []
    for n in range(N):
        padded = [
            jnp.pad(
                t.cores[n],
                ((0, rmaxs[n] - t.cores[n].shape[0]), (0, 0),
                 (0, rmaxs[n + 1] - t.cores[n].shape[2])),
            )
            for t in ts
        ]
        bcores.append(jnp.stack(padded, axis=0))
    return tn.Tensor(bcores, batch=True)


def unfolding(data, n, batch: bool = False):
    """n-th mode unfolding of a dense array (reference tools.py:211-228)."""
    data = asarray(data)
    if batch:
        perm = [0, n + 1] + list(range(1, n + 1)) + list(range(n + 2, data.ndim))
        return jnp.transpose(data, perm).reshape(data.shape[0], data.shape[n + 1], -1)
    perm = [n] + list(range(n)) + list(range(n + 1, data.ndim))
    return jnp.transpose(data, perm).reshape(data.shape[n], -1)


def right_unfolding(core, batch: bool = False):
    """R_{n-1} x (I_n R_n) matricization (reference tools.py:231-243)."""
    if batch:
        return core.reshape(core.shape[0], core.shape[1], -1)
    return core.reshape(core.shape[0], -1)


def left_unfolding(core, batch: bool = False):
    """(R_{n-1} I_n) x R_n matricization (reference tools.py:246-258)."""
    if batch:
        return core.reshape(core.shape[0], -1, core.shape[-1])
    return core.reshape(-1, core.shape[-1])


"""
Multilinear algebra
"""


def ttm(t, U, dim=None, transpose: bool = False):
    """Tensor-times-matrix along one or several modes (reference tools.py:266-325)."""
    if not isinstance(U, (list, tuple)):
        U = [U]
    U = [asarray(u) for u in U]
    if dim is None:
        dim = range(len(U))
    if not hasattr(dim, "__len__"):
        dim = [dim]
    dim = [d + t.dim() if d < 0 else d for d in dim]

    with jax.default_matmul_precision(matmul_precision()):
        return _ttm_impl(t, U, dim, transpose)


def _ttm_impl(t, U, dim, transpose):
    cores, Us = [], []
    for n in range(t.dim()):
        if n in dim:
            factor = U[dim.index(n)]
            if transpose:
                factor = jnp.swapaxes(factor, -1, -2)
            if factor.ndim == 1:
                # A plain vector: lift to a 1-row matrix; in batch layout it
                # broadcasts over the leading batch axis of the cores
                factor = factor[None, ...]
            elif factor.ndim == 2 and t.batch:
                # (B, I): one weight vector per sample
                factor = factor[:, None, ...]
            if t.Us[n] is None:
                if t.cores[n].ndim == (4 if t.batch else 3):
                    cores.append(jnp.einsum("...iak,...ja->...ijk", t.cores[n], factor))
                else:
                    cores.append(jnp.einsum("...ai,...ja->...ji", t.cores[n], factor))
                Us.append(None)
            else:
                cores.append(t.cores[n])
                Us.append(factor @ t.Us[n])
        else:
            cores.append(t.cores[n])
            Us.append(t.Us[n])
    return tn.Tensor(cores, Us=Us, idxs=t.idxs, batch=t.batch)


"""
Miscellaneous
"""


def mask(t, mask):
    """idxs-aligned elementwise mask product (reference tools.py:333-359).
    Batch input is supported (beyond-parity): the non-batch mask is
    broadcast over the leading batch axis."""
    off = 1 if t.batch else 0
    if not hasattr(t, "idxs") or t.idxs is None:
        idxs = [np.arange(sh) for sh in t.shape[off:]]
    else:
        idxs = t.idxs[off:] if t.batch else t.idxs
    cores, Us = [], []
    for n in range(t.dim()):
        idx = np.array(idxs[n]).astype(np.int64)
        idx[idx >= mask.shape[n]] = mask.shape[n] - 1  # clamp
        if mask.Us[n] is None:
            cores.append(mask.cores[n][..., idx, :])
            Us.append(None)
        else:
            cores.append(mask.cores[n])
            Us.append(mask.Us[n][idx, :])
    if t.batch:
        B = t.shape[0]
        cores = [jnp.broadcast_to(c, (B,) + c.shape) for c in cores]
        Us = [None if U is None else jnp.broadcast_to(U, (B,) + U.shape) for U in Us]
    m = tn.Tensor(cores, Us, batch=t.batch)
    return t * m


from functools import partial as _partial


@_partial(jax.jit, static_argnums=(2,))
def _sample_kernel(cores, key, P):
    """Sequential-conditional sampling from a TT PMF, fully on device
    (one XLA program): per mode, marginalize the suffix with a right-product
    chain, form the P conditional PMFs as a matmul, and invert the CDFs."""
    N = len(cores)
    rights = [jnp.ones((1,), dtype=cores[0].dtype)]
    for core in cores[::-1]:
        rights.append(jnp.sum(core, axis=1) @ rights[-1])
    rights = rights[::-1]
    keys = jax.random.split(key, N)
    lefts = jnp.ones((P, 1), dtype=cores[0].dtype)
    Xs = []
    for mu, core in enumerate(cores):
        fiber = jnp.einsum("ijk,k->ij", core, rights[mu + 1])
        per_point = lefts @ fiber  # (P, I)
        p = jnp.abs(per_point)
        p = p / jnp.sum(p, axis=1, keepdims=True)
        cdf = jnp.cumsum(p, axis=1)
        u = jax.random.uniform(keys[mu], (P, 1), dtype=p.dtype)
        rows = jnp.minimum(jnp.sum(cdf < u, axis=1), core.shape[1] - 1)
        Xs.append(rows)
        lefts = jnp.einsum("ij,jik->ik", lefts, core[:, rows, :])
    return jnp.stack(Xs, axis=1)


def sample(t, P: int = 1, seed=None):
    """Draw P integer points (with replacement) from the tensor viewed as an
    unnormalized PMF (reference tools.py:362-407). Unlike the reference's
    host-side NumPy loop, the whole sequential-conditional sampler (PRNG
    included) runs on device as one jitted program."""
    import tntorch_tpu.utils as utils

    key = jax.random.key(seed) if seed is not None else utils.next_key()
    t2 = t.decompress_tucker_factors()
    t2._cp_to_tt()
    return _sample_kernel(tuple(t2.cores), key, int(P))


def hash(t):
    """Representation-independent fingerprint: dot with a fixed random rank-1
    tensor (reference tools.py:410-424). Batch tensors return (B,) per-sample
    fingerprints (the weight tensor is broadcast over the batch axis, so a
    sample's hash equals the non-batch hash of that sample)."""
    key = jax.random.key(0)
    off = 1 if t.batch else 0
    fdtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    core_shape = (1, 1, 1)
    cores = [jnp.ones(((t.shape[0],) if off else ()) + core_shape, dtype=t.cores[0].dtype) for _ in range(t.dim())]
    Us = []
    for sh in list(t.shape)[off:]:
        key, sub = jax.random.split(key)
        U = jax.random.uniform(sub, (sh, 1), dtype=fdtype)
        if off:
            U = jnp.broadcast_to(U[None], (t.shape[0],) + U.shape)
        Us.append(U)
    w = tn.Tensor(cores, Us, batch=t.batch)
    return t.dot(w)


def generate_basis(name: str, shape, orthonormal: bool = False):
    """Truncated function bases: dct/legendre/chebyshev/hermite/identity
    (reference tools.py:427-457)."""
    if name == "dct":
        import scipy.fft

        U = scipy.fft.dct(np.eye(shape[0]), norm="ortho")[:, : shape[1]]
    elif name == "identity":
        U = np.eye(shape[0], shape[1])
    else:
        eval_points = np.linspace(-1, 1, shape[0])
        if name == "legendre":
            U = np.polynomial.legendre.legval(eval_points, np.eye(shape[0], shape[1])).T
        elif name == "chebyshev":
            U = np.polynomial.chebyshev.chebval(eval_points, np.eye(shape[0], shape[1])).T
        elif name == "hermite":
            U = np.polynomial.hermite.hermval(eval_points, np.eye(shape[0], shape[1])).T
        else:
            raise ValueError("Unsupported basis function")
    if orthonormal:
        U = U / np.sqrt(np.sum(U * U, axis=0))
    return jnp.asarray(U)


def reduce(ts, function, eps=0, rmax=np.iinfo(np.int32).max, algorithm="svd", verbose=False, **kwargs):
    """Binary-tree fold of a tensor sequence with intermediate rounding
    (reference tools.py:460-512) — the bounded-rank 'long input' strategy."""
    d = dict()
    start = time.time()
    for i, elem in enumerate(ts):
        if verbose and i % 100 == 0:
            print("reduce: element {}, time={:g}".format(i, time.time() - start))
        climb = 0
        while climb in d:
            elem = tn.round(function(d[climb], elem, **kwargs), eps=eps, rmax=rmax, algorithm=algorithm)
            d.pop(climb)
            climb += 1
        d[climb] = elem
    keys = list(d.keys())
    result = d[keys[0]]
    for key in keys[1:]:
        result = tn.round(function(result, d[key], **kwargs), eps=eps, rmax=rmax, algorithm=algorithm)
    return result


def pad(t, shape, dim=None, fill_value=0):
    """Pad modes with a constant (reference tools.py:515-576)."""
    if dim is None:
        dim = range(t.dim())
    if not hasattr(dim, "__len__"):
        dim = [dim]
    if not hasattr(shape, "__len__"):
        shape = [shape] * len(dim)

    t = t.clone()
    for i in range(len(dim)):
        d = dim[i] + t.dim() if dim[i] < 0 else dim[i]
        mult = fill_value if i == 0 else 0
        # The mode axis of every layout (CP (I,R), TT (Rl,I,Rr), and their
        # batch variants with a leading B) is axis -2 — same rule as cat
        if t.Us[d] is None:
            c = t.cores[d]
            extra = mult * jnp.ones(c.shape[:-2] + (shape[i] - c.shape[-2], c.shape[-1]), dtype=c.dtype)
            t.cores[d] = jnp.concatenate([c, extra], axis=-2)
        else:
            U = t.Us[d]
            extra = mult * jnp.ones(U.shape[:-2] + (shape[i] - U.shape[-2], U.shape[-1]), dtype=U.dtype)
            t.Us[d] = jnp.concatenate([U, extra], axis=-2)
    return t


def convolve(t1, t2, mode: str = "full", **kwargs):
    """ND convolution via per-core FFT + cross-approximated frequency product
    (Rakhuba-Oseledets; reference tools.py:579-647)."""
    N = t1.dim()
    assert N == t2.dim()
    t1 = t1.decompress_tucker_factors()
    t2 = t2.decompress_tucker_factors()
    t1f = tn.Tensor(
        [jnp.fft.fft(t1.cores[n], n=t1.shape[n] + t2.shape[n] - 1, axis=1) for n in range(N)]
    )
    t2f = tn.Tensor(
        [jnp.fft.fft(t2.cores[n], n=t1.shape[n] + t2.shape[n] - 1, axis=1) for n in range(N)]
    )

    def multr(x, y):
        return jnp.real(x) * jnp.real(y) - jnp.imag(x) * jnp.imag(y)

    def multi(x, y):
        return jnp.imag(x) * jnp.real(y) + jnp.real(x) * jnp.imag(y)

    t12fr = tn.cross(tensors=[t1f, t2f], function=multr, **kwargs)
    t12fi = tn.cross(tensors=[t1f, t2f], function=multi, **kwargs)
    t12fi.cores[-1] = t12fi.cores[-1] * 1j
    t12r = tn.Tensor([jnp.fft.ifft(t12fr.cores[n], axis=1) for n in range(N)])
    t12i = tn.Tensor([jnp.fft.ifft(t12fi.cores[n], axis=1) for n in range(N)])
    t12 = tn.cross(
        tensors=[t12r, t12i], function=lambda x, y: jnp.real(x) + jnp.real(y), **kwargs
    )

    if mode == "same":
        # Centered crop matching np.convolve (the reference starts at k//2,
        # tools.py:639-641, which is off by one for even kernel sizes)
        for n in range(N):
            out_len = max(t1.shape[n], t2.shape[n])
            full_len = t1.shape[n] + t2.shape[n] - 1
            start = (full_len - out_len) // 2
            t12.cores[n] = t12.cores[n][:, start : start + out_len, :]
    elif mode == "valid":
        for n in range(N):
            k = min(t1.shape[n], t2.shape[n])
            # out_len = max - min + 1; an explicit end index avoids the
            # reference's -(k-1) slice, which is empty when k == 1
            out_len = max(t1.shape[n], t2.shape[n]) - k + 1
            t12.cores[n] = t12.cores[n][:, k - 1 : k - 1 + out_len, :]
    return t12


@_partial(jax.jit, static_argnums=(1, 2, 4))
def _shift_mode_kernel(cores, n, shift, eps, same_mode):
    """All pairwise SVD swaps of a mode shift as ONE jitted program
    (VERDICT r2 weak #6: the eager loop costs 2 host syncs per swap through
    the TPU tunnel). Truncation is a masked projection at the padded bond
    width min(R1*I2, I1*R3); the data-dependent effective bond ranks come
    back as one int vector — the single sync. `same_mode` keeps each bond
    at its (static) original rank, so no masking or sync is needed."""
    cores = list(cores)
    sign = 1 if shift > 0 else -1
    delta_scale = eps / float(np.sqrt(abs(shift)))
    effs = []
    for i in range(n, n + shift, sign):
        c1, c2, left_ortho = (i, i + 1, True) if sign == 1 else (i - 1, i, False)
        A, B = cores[c1], cores[c2]
        R1, I1, R2 = A.shape
        _, I2, R3 = B.shape
        sc = jnp.einsum("iaj,jbk->ibak", A, B).reshape(R1 * I2, I1 * R3)
        U, S, Vt = jnp.linalg.svd(sc, full_matrices=False)
        k = S.shape[0]
        if same_mode:
            r = min(R2, k)
            U, S, Vt = U[:, :r], S[:r], Vt[:r]
            mask = jnp.ones((r,), dtype=S.dtype)
            kw = r
        else:
            S2 = S**2
            delta2 = (delta_scale**2) * jnp.sum(S2)  # delta = eps' * |sc|_F
            k_discard = jnp.sum(jnp.cumsum(S2[::-1]) <= delta2)
            r = jnp.clip(k - k_discard, 1, k)
            mask = (jnp.arange(k) < r).astype(S.dtype)
            effs.append(r)
            kw = k
        if left_ortho:
            left = U * mask[None, :]
            right = (S[:, None] * Vt) * mask[:, None]
        else:
            left = (U * S[None, :]) * mask[None, :]
            right = Vt * mask[:, None]
        cores[c1] = left.reshape(R1, I2, kw)
        cores[c2] = right.reshape(kw, I1, R3)
    if same_mode:
        return cores, jnp.zeros((0,), dtype=jnp.int32)
    return cores, jnp.stack(effs).astype(jnp.int32)


def shift_mode(t, n, shift, eps=1e-3):
    """Move a mode within the TT via pairwise SVD swaps; in place
    (reference tools.py:650-698). For pure-TT non-batch input the whole
    swap chain runs as one jitted program with at most one host sync (the
    effective bond ranks); other layouts use the eager per-swap loop."""
    N = t.dim()
    assert 0 <= n + shift < N
    if isinstance(eps, str) and eps != "same":
        raise ValueError("Relative error '{}' not recognized".format(eps))
    if shift == 0:
        return t
    if any(U is not None for U in t.Us):
        t2 = t.decompress_tucker_factors(_clone=False)
        t.cores = t2.cores
        t.Us = t2.Us
    t.orthogonalize(n)

    pure_tt = not t.batch and all(c.ndim == 3 for c in t.cores)
    if pure_tt and (eps == "same" or (not isinstance(eps, str) and eps >= 0)):
        same_mode = eps == "same"
        # Pin the policy's matmul precision: the context keys the jit trace,
        # so on TPU the swap einsums don't run at the ambient single-pass
        # bf16 default (~1e-2 error) under the 'highest' policy.
        with jax.default_matmul_precision(matmul_precision()):
            padded, effs = _shift_mode_kernel(
                tuple(t.cores), int(n), int(shift),
                0.0 if same_mode else float(eps), same_mode,
            )
        cores = list(padded)
        if not same_mode and len(effs):
            effs_host = [int(e) for e in np.asarray(effs)]  # the one sync
            sign = int(np.sign(shift))
            for s_idx, i in enumerate(range(n, n + shift, sign)):
                c1, c2 = (i, i + 1) if sign == 1 else (i - 1, i)
                r = effs_host[s_idx]
                cores[c1] = cores[c1][:, :, :r]
                cores[c2] = cores[c2][:r]
        t.cores = cores
        return t

    cores = t.cores
    sign = int(np.sign(shift))
    batch = t.batch
    with jax.default_matmul_precision(matmul_precision()):
        return _shift_mode_eager(t, cores, n, shift, sign, batch, eps)


def _shift_mode_eager(t, cores, n, shift, sign, batch, eps):
    """Eager per-swap loop (batch / Tucker-decompressed layouts). Pinned to
    the policy's matmul precision: on TPU the ambient f32 default is
    single-pass bf16, which costs ~1e-2 on the swap einsum chains."""
    for i in range(n, n + shift, sign):
        if sign == 1:
            c1, c2, left_ortho = i, i + 1, True
        else:
            c1, c2, left_ortho = i - 1, i, False
        R1 = cores[c1].shape[-3]
        R2 = cores[c1].shape[-1]
        R3 = cores[c2].shape[-1]
        I1 = cores[c1].shape[-2]
        I2 = cores[c2].shape[-2]
        lead = cores[c1].shape[:-3]  # (B,) for batch tensors, () otherwise
        sc = jnp.einsum("...iaj,...jbk->...ibak", cores[c1], cores[c2])
        sc = sc.reshape(lead + (R1 * I2, I1 * R3))
        if eps == "same":
            left, right = tn.truncated_svd(
                sc, eps=0, rmax=R2, left_ortho=left_ortho, batch=batch
            )
        elif eps >= 0:
            left, right = tn.truncated_svd(
                sc, eps=eps / np.sqrt(np.abs(shift)), left_ortho=left_ortho,
                batch=batch,
            )
        else:
            raise ValueError("Relative error '{}' not recognized".format(eps))
        newR2 = left.shape[-1]
        cores[c1] = left.reshape(lead + (R1, I2, newR2))
        cores[c2] = right.reshape(lead + (newR2, I1, R3))
    return t
