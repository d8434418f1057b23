"""Propositional calculus on 2^N mask tensors.

Behavioral reference: /root/reference/tntorch/logic.py:7-261. Formulas are
rank-1-ish TT tensors over {0,1}^N; connectives reduce to arithmetic and
norms/sums on compressed tensors.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

import tntorch_tpu as tn
from tntorch_tpu.utils import default_dtype


def true(N):
    """Formula satisfied by all inputs (reference logic.py:9-21)."""
    dtype = default_dtype()
    return tn.Tensor([jnp.ones((1, 2, 1), dtype=dtype) for _ in range(N)])


def false(N):
    """Formula satisfied by no inputs (reference logic.py:24-36)."""
    dtype = default_dtype()
    return tn.Tensor([jnp.zeros((1, 2, 1), dtype=dtype) for _ in range(N)])


def all(N, which=None):
    """Satisfied iff all (selected) symbols are true (reference logic.py:31-50)."""
    if which is None:
        which = list(range(N))
    dtype = default_dtype()
    cores = []
    for n in range(N):
        if n in which:
            cores.append(jnp.asarray([[[0.0], [1.0]]], dtype=dtype))
        else:
            cores.append(jnp.ones((1, 2, 1), dtype=dtype))
    return tn.Tensor(cores)


def none(N, which=None):
    """Formula: no (selected) variable is 1 (reference logic.py:57-70)."""
    if which is None:
        which = list(range(N))
    dtype = default_dtype()
    cores = []
    for n in range(N):
        if n in which:
            cores.append(jnp.asarray([[[1.0], [0.0]]], dtype=dtype))
        else:
            cores.append(jnp.ones((1, 2, 1), dtype=dtype))
    return tn.Tensor(cores)


def any(N, which=None):
    """Formula: at least one (selected) variable is 1 (reference logic.py:73-87)."""
    return ~none(N, which)


def one(N, which=None):
    """Exactly-one (n-ary XOR) (reference logic.py:88-103)."""
    if which is None:
        return tn.weight_mask(N, 1)
    return tn.weight_mask(N, 1) & any(N, which)


def symbols(N):
    """N presence indicator tensors x_1..x_N (reference logic.py:105-117)."""
    return [presence(N, n) for n in range(N)]


def relevant_symbols(t):
    """Variables that affect the output in at least one case (reference logic.py:118-134)."""
    cores = [jnp.concatenate((c[:, 1:2, :] - c[:, 0:1, :], c), axis=1) for c in t.cores]
    t2 = tn.Tensor(cores)
    return [
        n
        for n in range(t.dim())
        if float(tn.norm(t2[tuple([slice(1, 3)] * n + [0] + [slice(1, 3)] * (t.dim() - n - 1))]))
        > 1e-10
    ]


def irrelevant_symbols(t):
    """Variables a formula does not depend on (reference logic.py:133-150)."""
    rel = relevant_symbols(t)
    return [n for n in range(t.dim()) if n not in rel]


def only(t):
    """Force all irrelevant symbols to zero (reference logic.py:150-165)."""
    return tn.mask(t, absence(t.dim(), irrelevant_symbols(t)))


def presence(N, which):
    """True iff all symbols in `which` are present (reference logic.py:168-182)."""
    which = np.atleast_1d(which)
    dtype = default_dtype()
    cores = [np.ones([1, 2, 1]) for _ in range(N)]
    for w in which:
        cores[w][0, 0, 0] = 0
    return tn.Tensor([jnp.asarray(c, dtype=dtype) for c in cores])


def absence(N, which):
    """Formula: none of the given variables is 1 (reference logic.py:168-180)."""
    which = np.atleast_1d(which)
    dtype = default_dtype()
    cores = [np.ones([1, 2, 1]) for _ in range(N)]
    for w in which:
        cores[w][0, 1, 0] = 0
    return tn.Tensor([jnp.asarray(c, dtype=dtype) for c in cores])


def is_tautology(t):
    """True if satisfied by every input (reference logic.py:183-194)."""
    return bool(tn.norm(~t) <= 1e-6)


def is_contradiction(t):
    """True if satisfied by no input (reference logic.py:197-207)."""
    return bool(tn.norm(t) <= 1e-6)


def is_satisfiable(t):
    """True if some input satisfies t (reference logic.py:210-221)."""
    return bool(tn.sum(t) >= 1e-6)


def implies(t1, t2):
    """True if t1 => t2 (reference logic.py:224-236)."""
    return bool(is_contradiction(t1 & ~t2))


def equiv(t1, t2):
    """True if t1 and t2 accept the same inputs (reference logic.py:239-251)."""
    return implies(t1, t2) & implies(t2, t1)
