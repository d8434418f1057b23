"""ANOVA decomposition and Sobol sensitivity indices, entirely in TT form.

Behavioral reference: /root/reference/tntorch/anova.py:9-201
(Ballester-Ripoll et al., "Sobol Tensor Trains for Global Sensitivity
Analysis", 2017).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

import tntorch_tpu as tn
from tntorch_tpu.utils import asarray


def anova_decomposition(t, marginals=None):
    """Expanded tensor containing all ANOVA terms: each mode's factor becomes
    [E; U - E] (reference anova.py:9-43). Batch tensors are supported
    (beyond-parity; the reference rejects them, anova.py:20-21): the
    expansion applies per sample over the leading batch axis."""
    dtype = t.cores[0].dtype
    off = 1 if t.batch else 0
    shapes = list(t.shape[off:])
    if marginals is None:
        marginals = [None] * t.dim()
    marginals = [
        jnp.ones(shapes[n], dtype=dtype) / float(shapes[n]) if m is None else asarray(m)
        for n, m in enumerate(marginals)
    ]
    cores = list(t.cores)
    Us = []
    idxs = []
    for n in range(t.dim()):
        if t.Us[n] is None:
            U = jnp.eye(shapes[n], dtype=dtype)
            if t.batch:
                U = jnp.broadcast_to(U, (t.shape[0],) + U.shape)
        else:
            U = t.Us[n]
        w = (marginals[n] / jnp.sum(marginals[n]))[:, None]
        expected = jnp.sum(U * w, axis=-2, keepdims=True)
        Us.append(jnp.concatenate((expected, U - expected), axis=-2))
        idxs.append(np.array([0] + [1] * shapes[n]))
    if t.batch:
        idxs = [np.arange(t.shape[0])] + idxs
    return tn.Tensor(cores, Us, idxs=idxs, batch=t.batch)


def undo_anova_decomposition(a):
    """Inverse of anova_decomposition (reference anova.py:46-64)."""
    cores = []
    Us = []
    for n in range(a.dim()):
        if a.Us[n] is None:
            cores.append(a.cores[n][..., 1:, :] + a.cores[n][..., 0:1, :])
            Us.append(None)
        else:
            cores.append(a.cores[n])
            Us.append(a.Us[n][..., 1:, :] + a.Us[n][..., 0:1, :])
    return tn.Tensor(cores, Us=Us, batch=a.batch)


def truncate_anova(t, mask, keepdim=False, marginals=None):
    """Keep only the ANOVA terms selected by `mask` (reference anova.py:67-96)."""
    t = undo_anova_decomposition(
        tn.mask(anova_decomposition(t, marginals=marginals), mask=mask)
    )
    if not keepdim:
        N = t.dim()
        affecting = np.sum(np.asarray(tn.accepted_inputs(mask)), axis=0)
        slices: list = [0 for _ in range(N)]
        for i in np.where(affecting)[0]:
            slices[int(i)] = slice(None)
        if t.batch:
            # __getitem__ keys on a batch tensor address the batch axis first.
            slices.insert(0, slice(None))
        t = t[tuple(slices)]
    return t


def sobol(t, mask, marginals=None, normalize=True):
    """Sobol index for the variable subset(s) given by `mask`
    (reference anova.py:99-148): a masked dot-product ratio on the ANOVA tensor."""
    if marginals is None:
        marginals = [None] * t.dim()

    off = 1 if t.batch else 0
    shapes = list(t.shape[off:])
    a = anova_decomposition(t, marginals)
    # Set the empty ANOVA term to 0
    dtype = a.cores[0].dtype
    oh_cores = [
        jnp.concatenate(
            (jnp.ones((1, 1, 1), dtype=dtype), jnp.zeros((1, sh, 1), dtype=dtype)),
            axis=1,
        )
        for sh in shapes
    ]
    if t.batch:
        B = t.shape[0]
        oh_cores = [jnp.broadcast_to(c, (B,) + c.shape) for c in oh_cores]
    one_hot0 = tn.Tensor(oh_cores, batch=t.batch)
    # a[(0,)*N] is a scalar (per-sample (B,) for batch — the per-sample
    # scalar arithmetic broadcasts it over each sample)
    empty_term = a[(slice(None),) * off + (0,) * t.dim()]
    a = a - one_hot0 * empty_term
    idxs = [np.array([0] + [1] * sh) for sh in shapes]
    a.idxs = ([np.arange(t.shape[0])] + idxs) if t.batch else idxs

    am = a.clone()
    for n in range(t.dim()):
        if marginals[n] is None:
            m = jnp.ones(shapes[n], dtype=dtype)
        else:
            m = asarray(marginals[n])
        m = m / jnp.sum(m)
        if am.Us[n] is None:
            # (..., I, R_right): m[:, None] broadcasts over every layout
            # (TT 3D/4D, CP 2D/3D)
            am.cores[n] = am.cores[n].at[..., 1:, :].multiply(m[:, None])
        else:
            am.Us[n] = am.Us[n].at[..., 1:, :].multiply(m[:, None])
    am_masked = tn.mask(am, mask)
    if am_masked.cores[-1].shape[-1] > 1:
        eye = jnp.eye(am_masked.cores[-1].shape[-1], dtype=dtype)[:, :, None]
        if t.batch:
            eye = jnp.broadcast_to(eye, (t.shape[0],) + eye.shape)
        am_masked.cores.append(eye)
        am_masked.Us.append(None)

    if normalize:
        return tn.dot(a, am_masked) / tn.dot(a, am)
    return tn.dot(a, am_masked)


def mean_dimension(t, mask=None, marginals=None):
    """Mean dimension: how additive the function is (reference anova.py:151-176)."""
    if mask is None:
        return sobol(t, tn.weight(t.dim()), marginals=marginals)
    return sobol(t, tn.mask(tn.weight(t.dim()), mask), marginals=marginals) / sobol(
        t, mask, marginals=marginals
    )


def dimension_distribution(t, mask=None, order=None, marginals=None):
    """Distribution of variance over interaction orders (reference anova.py:179-201)."""
    if order is None:
        order = t.dim()
    if mask is None:
        # [..., 1:]: skip the order-0 (empty) term; ellipsis keeps the
        # leading batch axis of a batched result
        return sobol(t, tn.weight_one_hot(t.dim(), order + 1), marginals=marginals).full()[..., 1:]
    mask2 = tn.mask(tn.weight_one_hot(t.dim(), order + 1), mask)
    num = sobol(t, mask2, marginals=marginals).full()[..., 1:]
    den = sobol(t, mask, marginals=marginals)
    if getattr(num, "ndim", 1) > 1:  # batched: (B, order) / (B, 1)
        den = den[..., None]
    return num / den
