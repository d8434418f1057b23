"""Constructors for compressed random/structured tensors.

Behavioral reference: /root/reference/tntorch/create.py:9-398. JAX requires
explicit PRNG keys; `key=` is accepted everywhere and defaults to a
process-level key stream (tntorch_tpu.utils.next_key).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

import tntorch_tpu as tn
from tntorch_tpu.utils import default_dtype, next_key


def eye(n: int, m: Optional[int] = None, device=None, requires_grad=None, dtype=None):
    """Identity matrix as a rank-m TT (reference create.py:9-23)."""
    if m is None:
        m = n
    dtype = dtype or default_dtype()
    c1 = jnp.eye(n, m, dtype=dtype)
    c2 = jnp.eye(m, m, dtype=dtype)
    return tn.Tensor([c1[None, :, :], c2[:, :, None]], device=device, requires_grad=requires_grad)


def rand(*shape, **kwargs):
    """Uniform-[0,1) random cores/factors (reference create.py:26-44)."""
    def function(shp, dtype, key=None):
        return jax.random.uniform(next_key(key), tuple(shp), dtype=dtype)

    return _create(function, *shape, **kwargs)


def rand_like(t, **kwargs):
    """Uniform tensor with the shape of `t` (reference create.py:31-41)."""
    return rand(t.shape, **kwargs)


def randn(*shape, **kwargs):
    """Standard-normal random cores/factors."""
    def function(shp, dtype, key=None):
        return jax.random.normal(next_key(key), tuple(shp), dtype=dtype)

    return _create(function, *shape, **kwargs)


def randn_like(t, **kwargs):
    """Gaussian tensor with the shape of `t` (reference create.py:59-69)."""
    return randn(t.shape, **kwargs)


def ones(*shape, **kwargs):
    """Rank-1 TT of all ones."""
    def function(shp, dtype, key=None):
        return jnp.ones(tuple(shp), dtype=dtype)

    return _create(function, *shape, ranks_tt=1, **kwargs)


def ones_like(t, **kwargs):
    """Rank-1 all-ones tensor with the shape of `t` (reference create.py:87-97)."""
    return ones(t.shape, **kwargs)


def full(shape, fill_value, **kwargs):
    """Rank-1 constant tensor."""
    return fill_value * ones(*shape, **kwargs)


def full_like(t, fill_value, **kwargs):
    """Constant tensor with the shape of `t` (reference create.py:115-126)."""
    return full(t.shape, fill_value=fill_value, **kwargs)


def zeros(*shape, **kwargs):
    """All-zeros tensor (reference create.py:129-138)."""
    def function(shp, dtype, key=None):
        return jnp.zeros(tuple(shp), dtype=dtype)

    return _create(function, *shape, ranks_tt=1, **kwargs)


def zeros_like(t, **kwargs):
    """All-zeros tensor with the shape of `t` (reference create.py:141-151)."""
    return zeros(t.shape, **kwargs)


def gaussian(*shape, sigma_factor=0.2):
    """Axis-aligned multivariate Gaussian, sums to 1 (reference create.py:167-194)."""
    if hasattr(shape[0], "__len__"):
        shape = shape[0]
    N = len(shape)
    if not hasattr(sigma_factor, "__len__"):
        sigma_factor = [sigma_factor] * N
    dtype = default_dtype()
    cores = [jnp.ones((1, 1, 1), dtype=dtype) for _ in range(N)]
    Us = []
    for n in range(N):
        sigma = sigma_factor[n] * shape[n]
        if shape[n] == 1:
            x = jnp.zeros((1,), dtype=dtype)
        else:
            x = jnp.linspace(-shape[n] / 2, shape[n] / 2, shape[n], dtype=dtype)
        U = jnp.exp(-(x**2) / (2 * sigma**2))
        U = U[:, None] / jnp.sum(U)
        Us.append(U)
    return tn.Tensor(cores, Us)


def gaussian_like(tensor, **kwargs):
    """Gaussian-bell tensor with the shape of `tensor` (reference create.py:197-207)."""
    return gaussian(tensor.shape, **kwargs)


def _create(
    function: Callable,
    *shape,
    ranks_tt=None,
    ranks_cp=None,
    ranks_tucker=None,
    requires_grad: bool = False,
    device: Optional[Any] = None,
    batch: bool = False,
    dtype: Optional[Any] = None,
    key: Optional[jax.Array] = None,
):
    """Generic constructor with per-mode TT/CP/Tucker rank plumbing
    (reference create.py:210-357)."""
    if hasattr(shape[0], "__len__"):
        shape = tuple(shape[0])
    dtype = dtype or default_dtype()
    N = len(shape) - (1 if batch else 0)

    if not hasattr(ranks_tucker, "__len__"):
        ranks_tucker = [ranks_tucker] * N

    corespatials = []
    if batch:
        corespatials.append(shape[0])
    for n in range(N):
        sp = shape[n + 1] if batch else shape[n]
        corespatials.append(sp if ranks_tucker[n] is None else ranks_tucker[n])

    if ranks_tt is None and ranks_cp is None:
        # Full TT ranks over the (possibly Tucker-reduced) core (create.py:243-272)
        if batch:
            datashape = [
                corespatials[0],
                corespatials[1],
                int(np.prod(corespatials[1:])) // corespatials[1],
            ]
        else:
            datashape = [corespatials[0], int(np.prod(corespatials)) // corespatials[0]]
        ranks_tt = []
        for n in range(1, N):
            if batch:
                ranks_tt.append(min(datashape[1:]))
                datashape = [
                    datashape[0],
                    datashape[1] * corespatials[n + 1],
                    datashape[2] // corespatials[n + 1],
                ]
            else:
                ranks_tt.append(min(datashape))
                datashape = [datashape[0] * corespatials[n], datashape[1] // corespatials[n]]

    if not hasattr(ranks_tt, "__len__"):
        ranks_tt = [ranks_tt] * (N - 1)
    ranks_tt = [None] + list(ranks_tt) + [None]
    if not hasattr(ranks_cp, "__len__"):
        ranks_cp = [ranks_cp] * N

    coreranks = list(ranks_tt)
    for n in range(N):
        if ranks_cp[n] is not None:
            if ranks_tt[n] is not None or ranks_tt[n + 1] is not None:
                raise ValueError("The ranks_tt and ranks_cp provided are incompatible")
            coreranks[n] = ranks_cp[n]
            coreranks[n + 1] = ranks_cp[n]
    if coreranks[0] is None:
        coreranks[0] = 1
    if coreranks[-1] is None:
        coreranks[-1] = 1
    if coreranks.count(None) > 0:
        raise ValueError("One or more TT/CP ranks were not specified")

    bdim = (shape[0],) if batch else ()
    # One independent subkey per core/factor draw: passing the caller's key
    # verbatim to every draw would make all same-shape cores bit-identical
    if key is not None:
        draw_keys = iter(jax.random.split(key, 2 * N))
    else:
        draw_keys = iter([None] * (2 * N))
    cores, Us = [], []
    for n in range(N):
        sp = shape[n + 1] if batch else shape[n]
        uk, ck = next(draw_keys), next(draw_keys)
        if ranks_tucker[n] is None:
            Us.append(None)
        else:
            Us.append(function(bdim + (sp, ranks_tucker[n]), dtype, uk))
        if ranks_cp[n] is None:
            cores.append(
                function(bdim + (coreranks[n], corespatials[n + (1 if batch else 0)], coreranks[n + 1]), dtype, ck)
            )
        else:
            cores.append(function(bdim + (corespatials[n + (1 if batch else 0)], ranks_cp[n]), dtype, ck))
    t = tn.Tensor(cores, Us=Us, batch=batch, device=device)
    t.requires_grad = requires_grad
    return t


def arange(*args, **kwargs):
    """1D TT wrapping jnp.arange (reference create.py:360-372)."""
    dtype = kwargs.pop("dtype", default_dtype())
    return tn.Tensor([jnp.arange(*args, **kwargs).astype(dtype)[None, :, None]])


def linspace(*args, **kwargs):
    """1D TT wrapping jnp.linspace (reference create.py:375-387)."""
    dtype = kwargs.pop("dtype", default_dtype())
    return tn.Tensor([jnp.linspace(*args, **kwargs).astype(dtype)[None, :, None]])


def logspace(*args, **kwargs):
    """1D TT wrapping jnp.logspace (reference create.py:390-402)."""
    dtype = kwargs.pop("dtype", default_dtype())
    return tn.Tensor([jnp.logspace(*args, **kwargs).astype(dtype)[None, :, None]])
