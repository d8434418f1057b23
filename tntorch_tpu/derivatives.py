"""Finite-difference vector calculus on compressed tensors.

Behavioral reference: /root/reference/tntorch/derivatives.py:6-302.
Derivatives act per-core (or per-Tucker-factor), so everything stays in
compressed form.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

import tntorch_tpu as tn
from tntorch_tpu.utils import asarray


def partialset(t, order=1, mask=None, bounds=None):
    """All partial derivatives of the given order(s), stacked into enlarged
    cores and selected by a Hamming-weight automaton (reference
    derivatives.py:6-69; batch input is beyond-parity — the differencing is
    per-core slicing and the weight mask broadcasts over the batch axis)."""
    off = 1 if t.batch else 0
    spatial = list(t.shape[off:])
    if bounds is None:
        bounds = [[0, sh - 1] for sh in spatial]
    if not hasattr(order, "__len__"):
        order = [order]
    max_order = max(order)

    def diff(core, n):
        if core.shape[-2] == 1:
            raise ValueError(
                "Tensor size {} along dimension {} not enough to compute high-order derivative".format(
                    spatial[n], n
                )
            )
        step = (bounds[n][1] - bounds[n][0]) / (core.shape[-2] - 1)
        return (core[..., 1:, :] - core[..., :-1, :]) / step

    cores = []
    idxs = []
    for n in range(t.dim()):
        if t.Us[n] is None:
            stack = [t.cores[n] if t._is_tt(t.cores[n]) else t._cp_to_tt(t.cores[n])]
        else:
            stack = [jnp.einsum("...ijk,...aj->...iak", t._cp_to_tt(t.cores[n]), t.Us[n])]
        idx = np.zeros([spatial[n]])
        for o in range(1, max_order + 1):
            stack.append(diff(stack[-1], n))
            idx = np.concatenate((idx, np.ones(stack[-1].shape[-2]) * o))
        cores.append(jnp.concatenate(stack, axis=-2))
        idxs.append(idx)
    if t.batch:
        idxs = [np.arange(t.shape[0])] + idxs
    d = tn.Tensor(cores, idxs=idxs, batch=t.batch)
    wm = tn.weight_mask(t.dim(), order, nsymbols=max_order + 1)
    if mask is not None:
        wm = tn.mask(wm, mask)
    result = tn.mask(d, wm)
    result.idxs = idxs
    return result


def partial(t, dim, order=1, bounds=None, periodic=False):
    """Single partial derivative via central differences (reference derivatives.py:72-130).

    ``bounds`` is positional PER ENTRY OF ``dim`` (the reference's default
    built one pair per mode and then indexed it by position in the dim list,
    silently using mode 0's span for every derivative — fixed here)."""
    if not hasattr(dim, "__len__"):
        dim = [dim]
    dim = [d + t.dim() if d < 0 else int(d) for d in dim]
    off = 1 if t.batch else 0
    if bounds is None:
        bounds = [[0, t.shape[d + off]] for d in dim]
    if not hasattr(bounds[0], "__len__"):
        bounds = [bounds]
    if len(bounds) != len(dim):
        raise ValueError(
            f"need one bounds pair per dim entry: got {len(bounds)} for {len(dim)} dims"
        )
    if not hasattr(periodic, "__len__"):
        periodic = [periodic] * len(dim)

    t2 = t.clone()
    for i, d in enumerate(dim):
        step = (bounds[i][1] - bounds[i][0]) / (t.shape[d + off] + 1) * 2
        for _ in range(1, order + 1):
            if periodic[i]:
                if t2.Us[d] is None:
                    c = t2.cores[d]
                    fwd = list(range(1, c.shape[-2])) + [0]
                    bwd = [-1] + list(range(0, c.shape[-2] - 1))
                    t2.cores[d] = (c[..., fwd, :] - c[..., bwd, :]) / step
                else:
                    U = t2.Us[d]
                    fwd = list(range(1, U.shape[-2])) + [0]
                    bwd = [-1] + list(range(0, U.shape[-2] - 1))
                    t2.Us[d] = (U[..., fwd, :] - U[..., bwd, :]) / step
            else:
                if t2.Us[d] is None:
                    c = t2.cores[d]
                    sh = c.shape[-2]
                    c = c[..., [0] + list(range(sh)) + [sh - 1], :]
                    c = c.at[..., 0, :].add(-(c[..., 2, :] - c[..., 1, :]))
                    c = c.at[..., -1, :].add(c[..., -2, :] - c[..., -3, :])
                    t2.cores[d] = (c[..., 2:, :] - c[..., :-2, :]) / step
                else:
                    U = t2.Us[d]
                    sh = U.shape[-2]
                    U = U[..., [0] + list(range(sh)) + [sh - 1], :]
                    U = U.at[..., 0, :].add(-(U[..., 2, :] - U[..., 1, :]))
                    U = U.at[..., -1, :].add(U[..., -2, :] - U[..., -3, :])
                    t2.Us[d] = (U[..., 2:, :] - U[..., :-2, :]) / step
    return t2


def gradient(t, dim="all", bounds=None):
    """Gradient along one or several modes (reference derivatives.py:133-157;
    the reference's scalar-dim form crashed — iterating the int and passing
    bounds into `order` — fixed here). Batch input differentiates every
    ensemble member at once (beyond-parity)."""
    off = 1 if t.batch else 0
    if dim == "all":
        dim = range(t.dim())
    scalar = not hasattr(dim, "__len__")
    if scalar:
        dim = [dim]
    dim = [d + t.dim() if d < 0 else int(d) for d in dim]
    if bounds is None:
        bounds = [[0, t.shape[d + off]] for d in dim]
    if not hasattr(bounds[0], "__len__"):
        bounds = [bounds] * len(dim)
    outs = [partial(t, d, order=1, bounds=[b]) for d, b in zip(dim, bounds)]
    return outs[0] if scalar else outs


def active_subspace(t, bounds=None, marginals=None):
    """Main variational directions: eigendecomposition of the gradient Gram
    matrix (Constantine et al.; reference derivatives.py:160-201).

    Batch input (beyond-parity) returns per-sample spectra: eigenvalues
    (B, N) descending and eigenvectors (B, N, N)."""
    off = 1 if t.batch else 0
    spatial = list(t.shape[off:])
    dtype = t.cores[0].dtype
    if marginals is None:
        marginals = [jnp.ones(sh, dtype=dtype) / sh for sh in spatial]
    marginals = [asarray(m) for m in marginals]
    assert all(len(marginals[n]) == spatial[n] for n in range(t.dim()))
    cores = []
    for n in range(t.dim()):
        marg = (marginals[n][:-1] + marginals[n][1:]) / 2
        marg = marg / marg.sum()
        marg = jnp.concatenate([marg, jnp.zeros(1, dtype=dtype)])
        core = marg[None, :, None]
        if t.batch:
            core = jnp.broadcast_to(core, (t.shape[0],) + core.shape)
        cores.append(core)
    pdf = tn.Tensor(cores, batch=t.batch)

    grad = gradient(t, dim="all", bounds=bounds)

    N = t.dim()
    bshape = (t.shape[0],) if t.batch else ()
    M = np.zeros(bshape + (N, N))
    for i in range(N):
        first = grad[i] * pdf
        for j in range(i, N):
            val = np.asarray(tn.dot(first, grad[j]))  # scalar, or (B,) batch
            M[..., i, j] = val
            M[..., j, i] = val

    w, v = jnp.linalg.eigh(jnp.asarray(M))
    return w[..., ::-1], v[..., :, ::-1]


def dgsm(t, bounds=None, marginals=None):
    """Derivative-based global sensitivity measures (Kucherenko & Iooss;
    reference derivatives.py:204-235). Batch input returns (B, N)."""
    off = 1 if t.batch else 0
    spatial = list(t.shape[off:])
    dtype = t.cores[0].dtype
    if marginals is None:
        marginals = [jnp.ones(sh, dtype=dtype) / sh for sh in spatial]
    marginals = [asarray(m) for m in marginals]
    assert all(len(marginals[n]) == spatial[n] for n in range(t.dim()))
    cores = []
    for n in range(t.dim()):
        marg = marginals[n] / marginals[n].sum()
        core = marg[None, :, None]
        if t.batch:
            core = jnp.broadcast_to(core, (t.shape[0],) + core.shape)
        cores.append(core)
    pdf = tn.Tensor(cores, batch=t.batch)

    grad = gradient(t, dim="all", bounds=bounds)
    N = t.dim()
    bshape = (t.shape[0],) if t.batch else ()
    result = np.zeros(bshape + (N,))
    for n in range(N):
        result[..., n] = np.asarray(tn.dot(grad[n] * pdf, grad[n]))
    return jnp.asarray(result)


def divergence(ts, bounds=None):
    """Divergence of an N-D vector field given as N tensors (reference derivatives.py:238-258)."""
    assert ts[0].dim() == len(ts)
    assert all(t.shape == ts[0].shape for t in ts[1:])
    if bounds is None:
        bounds = [None] * len(ts)
    elif not hasattr(bounds[0], "__len__"):
        bounds = [bounds for _ in range(len(ts))]
    assert len(bounds) == len(ts)
    return sum(partial(ts[n], n, order=1, bounds=bounds[n]) for n in range(len(ts)))


def curl(ts, bounds=None):
    """Curl of a 3D vector field (reference derivatives.py:261-283; the
    reference asserted a non-empty list comprehension — always true — so 4D
    fields were silently accepted)."""
    assert all(t.dim() == 3 for t in ts)
    assert len(ts) == 3
    if bounds is None:
        bounds = [None for _ in range(3)]
    elif not hasattr(bounds[0], "__len__"):
        bounds = [bounds for _ in range(3)]
    assert len(bounds) == 3
    return [
        partial(ts[2], 1, bounds=bounds[1]) - partial(ts[1], 2, bounds=bounds[2]),
        partial(ts[0], 2, bounds=bounds[2]) - partial(ts[2], 0, bounds=bounds[0]),
        partial(ts[1], 0, bounds=bounds[0]) - partial(ts[0], 1, bounds=bounds[1]),
    ]


def laplacian(t, bounds=None):
    """Laplacian of a scalar field (reference derivatives.py:286-302)."""
    if bounds is None:
        bounds = [None] * t.dim()
    elif not hasattr(bounds[0], "__len__"):
        bounds = [bounds for _ in range(t.dim())]
    assert len(bounds) == t.dim()
    return sum(partial(t, n, order=2, bounds=bounds[n]) for n in range(t.dim()))
