"""TT tensors as weighted finite automata (Hamming-weight masks etc.).

Behavioral reference: /root/reference/tntorch/automata.py:6-128. The
`length` function, a NotImplementedError stub in the reference
(automata.py:74-81), is implemented here.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

import tntorch_tpu as tn
from tntorch_tpu.utils import default_dtype


def weight_mask(N, weight, nsymbols=2):
    """Mask accepting strings whose number of 1's is in `weight`
    (reference automata.py:6-23)."""
    if not hasattr(weight, "__len__"):
        weight = [weight]
    weight = np.asarray(weight, dtype=np.int64)
    assert weight[0] >= 0
    t = weight_one_hot(N, int(weight.max() + 1), nsymbols)
    t.cores[-1] = jnp.sum(t.cores[-1][:, :, weight], axis=2, keepdims=True)
    return t


def weight_one_hot(N, r=None, nsymbols=2):
    """Counter automaton: maps a string with k ones to one-hot(k)
    (reference automata.py:26-51)."""
    if not hasattr(nsymbols, "__len__"):
        nsymbols = [nsymbols] * N
    assert len(nsymbols) == N
    if r is None:
        r = N + 1
    dtype = default_dtype()
    cores = []
    for n in range(N):
        core = np.zeros([r, nsymbols[n], r])
        core[:, 0, :] = np.eye(r)
        for s in range(1, nsymbols[n]):
            core[:, s, s:] = np.eye(r)[:, :-s]
        cores.append(jnp.asarray(core, dtype=dtype))
    cores[0] = cores[0][0:1, :, :]
    return tn.Tensor(cores)


def weight(N, nsymbols=2):
    """Automaton computing the Hamming weight of a string (reference automata.py:54-71)."""
    dtype = default_dtype()
    cores = []
    for n in range(N):
        core = np.tile(np.eye(2)[:, None, :], (1, nsymbols, 1))
        core[1, :, 0] = np.arange(nsymbols)
        cores.append(jnp.asarray(core, dtype=dtype))
    cores[0] = cores[0][1:2, :, :]
    cores[-1] = cores[-1][:, :, 0:1]
    return tn.Tensor(cores)


def length(N, nsymbols=2):
    """Tensor whose entry at string s equals the length of s's support run —
    here defined as the number of non-zero symbols (generalizes `weight` to
    arbitrary alphabets by counting any non-zero symbol once).

    The reference leaves this unimplemented (automata.py:74-81); we provide
    the natural semantics: t[s] = #(non-zero symbols in s).
    """
    dtype = default_dtype()
    cores = []
    for n in range(N):
        core = np.tile(np.eye(2)[:, None, :], (1, nsymbols, 1))
        core[1, :, 0] = (np.arange(nsymbols) != 0).astype(np.float64)
        cores.append(jnp.asarray(core, dtype=dtype))
    cores[0] = cores[0][1:2, :, :]
    cores[-1] = cores[-1][:, :, 0:1]
    return tn.Tensor(cores)


def accepted_inputs(t):
    """All strings accepted by the automaton, in lexicographic order; a string
    s appears t[s] times (reference automata.py:84-128). Host-side DFS with
    precomputed right-product chains."""
    if t.batch:
        # Beyond-parity (the reference rejects batch here, automata.py:92-93):
        # accepted-string counts differ per sample, so the result is a list of
        # (total_b, N) index arrays, one per batch member.
        return [
            accepted_inputs(
                tn.Tensor(
                    [c[b] for c in t.cores],
                    Us=[None if U is None else U[b] for U in t.Us],
                    batch=False,
                )
            )
            for b in range(t.cores[0].shape[0])
        ]

    cores = [np.asarray(c) for c in t.decompress_tucker_factors().cores]
    N = len(cores)

    rights = [np.ones(1)]
    for core in cores[::-1]:
        rights.append(core.sum(axis=1) @ rights[-1])
    rights = rights[::-1]

    total = int(round(float(tn.sum(t))))
    Xs = np.zeros([total, N], dtype=np.int64)

    def recursion(left, bound, mu):
        if mu == N:
            return
        fiber = np.einsum("ijk,k->ij", cores[mu], rights[mu + 1])
        per_point = np.round(left @ fiber)
        c = np.concatenate(([0], np.cumsum(per_point))).astype(np.int64)
        for i in range(per_point.shape[-1]):
            if c[i] == c[i + 1]:  # improductive prefix
                continue
            Xs[bound + c[i]:bound + c[i + 1], mu] = i
            recursion(left @ cores[mu][:, i, :], bound + c[i], mu + 1)

    recursion(np.ones(1), 0, 0)
    return jnp.asarray(Xs)
