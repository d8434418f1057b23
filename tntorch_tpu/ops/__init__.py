"""Elementwise operation family on compressed tensors.

Behavioral reference: /root/reference/tntorch/ops.py:6-348. All nonlinear
elementwise ops are computed by TT-cross approximation over the input
tensor(s); `cumsum` is exact (per-core prefix sums).

The submodules host the TPU compute kernels:
- ops.contractions — jitted core-chain contractions (dot / full / ttm)
- ops.rounding — jitted fixed-rank rounding kernels used by the perf path
"""

from __future__ import annotations

import jax.numpy as jnp

import tntorch_tpu as tn

__all__ = [
    "cumsum", "cumprod", "abs", "acos", "asin", "atan", "cos", "cosh", "erf",
    "erfinv", "exp", "log", "log10", "log2", "reciprocal", "rsqrt", "sigmoid",
    "sin", "sinh", "sqrt", "tan", "tanh", "add", "atan2", "div", "mul", "pow",
]


def cumsum(t, dim=None):
    """Exact cumulative sum along modes (reference ops.py:6-30)."""
    if dim is None:
        dim = range(t.dim())
    if not hasattr(dim, "__len__"):
        dim = [dim]
    t = t.clone()
    for n in dim:
        if t.Us[n] is None:
            t.cores[n] = jnp.cumsum(t.cores[n], axis=-2)
        else:
            t.Us[n] = jnp.cumsum(t.Us[n], axis=1 if t.batch else 0)
    return t


def cumprod(t, dim=None):
    """Cumulative product = exp(cumsum(log(t))), via cross (reference ops.py:33-45)."""
    return tn.exp(tn.cumsum(tn.log(t), dim=dim))


def _unary(fn):
    def op(t, **kwargs):
        return tn.cross(lambda x: fn(x), tensors=[t], verbose=False, **kwargs)

    return op


# Unary elementwise family (reference ops.py:53-278)
abs = _unary(jnp.abs)
acos = _unary(jnp.arccos)
asin = _unary(jnp.arcsin)
atan = _unary(jnp.arctan)
cos = _unary(jnp.cos)
cosh = _unary(jnp.cosh)
erf = _unary(lambda x: __import__("jax").scipy.special.erf(x))
erfinv = _unary(lambda x: __import__("jax").scipy.special.erfinv(x))
exp = _unary(jnp.exp)
log = _unary(jnp.log)
log10 = _unary(lambda x: jnp.log(x) / jnp.log(10.0))
log2 = _unary(lambda x: jnp.log(x) / jnp.log(2.0))
reciprocal = _unary(lambda x: 1.0 / x)
rsqrt = _unary(lambda x: 1.0 / jnp.sqrt(x))
sigmoid = _unary(lambda x: 1.0 / (1.0 + jnp.exp(-x)))
sin = _unary(jnp.sin)
sinh = _unary(jnp.sinh)
sqrt = _unary(jnp.sqrt)
tan = _unary(jnp.tan)
tanh = _unary(jnp.tanh)


def add(t1, t2):
    """Elementwise add via cross (reference ops.py:286-296)."""
    return tn.cross(lambda x, y: x + y, tensors=[t1, t2], verbose=False)


def atan2(t1, t2):
    """Elementwise atan2(t1, t2) via cross (reference ops.py:22-33)."""
    return tn.cross(lambda x, y: jnp.arctan2(x, y), tensors=[t1, t2], verbose=False)


def div(t1, t2):
    """Elementwise division via cross (reference ops.py:60-71)."""
    return t1 / t2


def mul(t1, t2):
    """Elementwise product via cross (reference ops.py:112-123)."""
    return tn.cross(lambda x, y: x * y, tensors=[t1, t2], verbose=False)


def pow(t1, t2):
    """Elementwise power t**k via cross (the reference's __pow__ is broken, tensor.py:789-795)."""
    return t1**t2
