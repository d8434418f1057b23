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
    [E; U - E] (reference anova.py:9-43)."""
    if t.batch:
        raise ValueError("Batched tensors are not supported.")
    dtype = t.cores[0].dtype
    if marginals is None:
        marginals = [None] * t.dim()
    marginals = [
        jnp.ones(t.shape[n], dtype=dtype) / float(t.shape[n]) if m is None else asarray(m)
        for n, m in enumerate(marginals)
    ]
    cores = list(t.cores)
    Us = []
    idxs = []
    for n in range(t.dim()):
        U = jnp.eye(t.shape[n], dtype=dtype) if t.Us[n] is None else t.Us[n]
        expected = jnp.sum(
            U * (marginals[n][:, None] / jnp.sum(marginals[n])), axis=0, keepdims=True
        )
        Us.append(jnp.concatenate((expected, U - expected), axis=0))
        idxs.append(np.array([0] + [1] * t.shape[n]))
    return tn.Tensor(cores, Us, idxs=idxs)


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
            Us.append(a.Us[n][1:, :] + a.Us[n][0:1, :])
    return tn.Tensor(cores, Us=Us)


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
        t = t[tuple(slices)]
    return t


def sobol(t, mask, marginals=None, normalize=True):
    """Sobol index for the variable subset(s) given by `mask`
    (reference anova.py:99-148): a masked dot-product ratio on the ANOVA tensor."""
    if marginals is None:
        marginals = [None] * t.dim()

    a = anova_decomposition(t, marginals)
    # Set the empty ANOVA term to 0
    one_hot0 = tn.Tensor(
        [
            jnp.concatenate(
                (jnp.ones((1, 1, 1), dtype=a.cores[0].dtype),
                 jnp.zeros((1, sh - 1, 1), dtype=a.cores[0].dtype)),
                axis=1,
            )
            for sh in a.shape
        ]
    )
    a = a - one_hot0 * a[(0,) * t.dim()]
    a.idxs = [np.array([0] + [1] * sh) for sh in t.shape]

    am = a.clone()
    for n in range(t.dim()):
        if marginals[n] is None:
            m = jnp.ones(t.shape[n], dtype=a.cores[0].dtype)
        else:
            m = asarray(marginals[n])
        m = m / jnp.sum(m)
        if am.Us[n] is None:
            if am.cores[n].ndim == 3:
                am.cores[n] = am.cores[n].at[:, 1:, :].multiply(m[None, :, None])
            else:
                am.cores[n] = am.cores[n].at[1:, :].multiply(m[:, None])
        else:
            am.Us[n] = am.Us[n].at[1:, :].multiply(m[:, None])
    am_masked = tn.mask(am, mask)
    if am_masked.cores[-1].shape[-1] > 1:
        am_masked.cores.append(
            jnp.eye(am_masked.cores[-1].shape[-1], dtype=a.cores[0].dtype)[:, :, None]
        )
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
        return sobol(t, tn.weight_one_hot(t.dim(), order + 1), marginals=marginals).full()[1:]
    mask2 = tn.mask(tn.weight_one_hot(t.dim(), order + 1), mask)
    return sobol(t, mask2, marginals=marginals).full()[1:] / sobol(
        t, mask, marginals=marginals
    )
