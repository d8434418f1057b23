"""Distributed heavy algorithms: multi-device TT rounding and batch-sharded
rounding (SURVEY.md §2 "TPU-native equivalent (a)-(d)").

The reference is single-device (no NCCL/MPI anywhere); these are new design
territory. The rounding algorithm is the two-sided Gram method (cf. Al Daas,
Ballard, Benner et al., "Parallel algorithms for TT arithmetic & rounding"):
every device owns a slice of each core along its MODE dimension, Gram
matrices are formed from local partial sums + one `psum` per edge, and the
small R x R factorizations (Cholesky/eigh) are computed redundantly on every
device — so the only communication is 2(N-1) all-reduces of R x R matrices,
riding ICI on a real pod mesh.
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _gram_round_local(cores, rmax, axis, edge_solver="eigh"):
    """Local (per-shard) body of the two-sided Gram rounding: identical math
    to ops.rounding._round_tt_gram_body, with every contraction over the mode
    index i closed by a psum over `axis` (i is the sharded dimension)."""
    from tntorch_tpu.ops.rounding import _sqrt_factor, _subspace_topr

    cores = list(cores)
    N = len(cores)
    dtype = cores[0].dtype

    # Right Gram chain: G[k] = Gram of cores k+1..N (R_k x R_k, replicated)
    G = [None] * (N + 1)
    G[N] = jnp.ones((1, 1), dtype=dtype)
    for k in range(N, 1, -1):
        C = cores[k - 1]
        T = jnp.einsum("aib,bc->aic", C, G[k])
        G[k - 1] = jax.lax.psum(jnp.einsum("aic,dic->ad", T, jnp.conj(C)), axis)

    L = jnp.ones((1, 1), dtype=dtype)
    for k in range(1, N):
        C = cores[k - 1]
        Lk = jax.lax.psum(jnp.einsum("aib,ac,cid->bd", jnp.conj(C), L, C), axis)
        # Same jittered-Cholesky sqrt as the single-device body
        # (rank-deficiency safe)
        F, Finv = _sqrt_factor(Lk)
        A = jnp.conj(F).T @ G[k] @ F
        rk = rmax if isinstance(rmax, int) else rmax[k - 1]
        r = min(rk, A.shape[0])
        if edge_solver == "rand" and r < A.shape[0]:
            # Replicated computation (A is psum'd on every shard), so every
            # shard derives the identical basis — no extra communication
            U = _subspace_topr(A, r)
        else:
            _, V = jnp.linalg.eigh(A)
            U = V[:, ::-1][:, :r]
        X = Finv @ U
        Y = jnp.conj(U).T @ jnp.conj(F).T
        cores[k - 1] = jnp.einsum("aib,bc->aic", C, X)
        nxt = cores[k]
        cores[k] = (Y @ nxt.reshape(nxt.shape[0], -1)).reshape(
            r, nxt.shape[1], nxt.shape[2]
        )
        L = jnp.eye(r, dtype=dtype)
    return tuple(cores)


def round_tt_gram_sharded(
    cores: Sequence[jax.Array], rmax, mesh: Mesh, axis: str = "tp",
    edge_solver: str = "eigh",
):
    """Multi-device fixed-rank TT rounding: cores sharded along their MODE
    dimension over `axis`, Gram reductions as explicit psums under shard_map.

    Matches ops.rounding.round_tt_gram numerically (same algorithm; the
    reduction is reordered across shards, so agreement is to roundoff, not
    bitwise). Mode sizes that do not divide the axis size are zero-padded —
    zero mode-slices change neither the Gram matrices nor the values on the
    original index range — and the padding is stripped from the output.

    :param rmax: int or per-edge sequence of ints (static)
    :return: list of rounded cores, mode-sharded over `axis`
    """
    n_shards = mesh.shape[axis]
    cores = [jnp.asarray(c) for c in cores]
    Is = [c.shape[1] for c in cores]
    padded = []
    for c in cores:
        I = c.shape[1]
        pad = (-I) % n_shards
        if pad:
            c = jnp.pad(c, ((0, 0), (0, pad), (0, 0)))
        padded.append(c)

    rmax = rmax if isinstance(rmax, int) else tuple(int(r) for r in rmax)
    run = _gram_round_sharded_jit(mesh, axis, rmax, edge_solver, len(padded))
    with jax.default_matmul_precision("highest"):
        out = run(tuple(padded))
    return [c[:, :I, :] for c, I in zip(out, Is)]


@lru_cache(maxsize=None)
def _gram_round_sharded_jit(mesh, axis, rmax, edge_solver, n_cores):
    """One jitted shard_map program per (mesh, axis, rmax, solver, N) —
    rebuilding the wrapper per call would retrace/recompile every
    invocation (first compiles cost 20-40 s through the TPU tunnel)."""
    from jax import shard_map

    spec = P(None, axis, None)
    fn = shard_map(
        partial(_gram_round_local, rmax=rmax, axis=axis, edge_solver=edge_solver),
        mesh=mesh,
        in_specs=(tuple(spec for _ in range(n_cores)),),
        out_specs=tuple(spec for _ in range(n_cores)),
    )
    return jax.jit(fn)


def round_tt_batch_sharded(
    cores: Sequence[jax.Array], rmax, mesh: Mesh, axis: str = "dp"
):
    """Batch-sharded fixed-rank rounding of a batch=True TT: the leading
    batch dim shards over `axis` (pure data parallelism, zero communication),
    each sample rounded by the vmapped single-device Gram kernel.

    :param cores: batched cores (B x R x I x R); B divisible by the axis size
    :return: list of rounded cores, batch-sharded over `axis`
    """
    rmax = rmax if isinstance(rmax, int) else tuple(int(r) for r in rmax)
    sharding = NamedSharding(mesh, P(axis, None, None, None))
    cores = [jax.device_put(c, sharding) for c in cores]
    return list(_batch_round_jit(tuple(cores), rmax))


@partial(jax.jit, static_argnames=("rmax",))
def _batch_round_jit(cs, rmax):
    """Module-level jit (shardings are part of jit's cache key, so the
    sharded inputs recompile once per mesh, not once per call)."""
    from tntorch_tpu.ops.rounding import _round_tt_gram_body

    with jax.default_matmul_precision("highest"):
        return jax.vmap(lambda *one: tuple(_round_tt_gram_body(list(one), rmax)))(*cs)


def shard_array(x, mesh: Mesh, axis: str = "dp"):
    """Place an array with its leading dim sharded over `axis` — the data
    half of the dp-sharded `optimize(..., mesh=)` recipe."""
    x = jnp.asarray(x)
    return jax.device_put(x, NamedSharding(mesh, P(axis, *(None,) * (x.ndim - 1))))


def replicate_pytree(tree, mesh: Mesh):
    """Replicate every leaf across the mesh (parameters in dp training)."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(jnp.asarray(x), NamedSharding(mesh, P())), tree
    )
