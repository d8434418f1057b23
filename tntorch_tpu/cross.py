"""TT-cross approximation: build a TT from a black-box function.

Behavioral reference: /root/reference/tntorch/cross.py:12-644 (Oseledets &
Tyrtyshnikov 2009; Savostyanov & Oseledets 2011). TPU-oriented layout:

- fiber evaluation is a batched einsum (interface x core x interface) that
  runs on device; for `tensors=` mode with a jnp-traceable function the whole
  evaluation stays on the accelerator;
- QR factorizations of the unfoldings run on device;
- maxvol pivoting runs ON DEVICE as a lax.while_loop (LU pivots + argmax +
  rank-1 updates), and the index bookkeeping stays in device arrays, so a
  sweep step costs ZERO host round trips; NaN guards and the convergence
  check sync once per iteration. (The reference ships every Q to the CPU,
  cross.py:400-402. The host/native-C++ maxvol remains for the rect_maxvol
  minimize path and as a public API.)
"""

from __future__ import annotations

import functools
import sys
import time
from typing import Any, Callable, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

import tntorch_tpu as tn
from tntorch_tpu.maxvol import _maxvol_device_impl, maxvol_device as _maxvol_dev
from tntorch_tpu.maxvol import rect_maxvol as _rect_maxvol
from tntorch_tpu.utils import logger


def _split_batch_samples(tensors):
    """For batch input, the list of per-sample Tensor lists; else None.

    minimize-mode pivoting is data-dependent per sample, so batch min/max
    run as independent crosses (same lift as elementwise ops on ensembles).
    """
    if tensors is None:
        return None
    ts = list(tensors) if isinstance(tensors, (list, tuple)) else [tensors]
    if not any(isinstance(t, tn.Tensor) and t.batch for t in ts):
        return None
    if not all(isinstance(t, tn.Tensor) and t.batch for t in ts):
        raise ValueError("Cannot mix batch and non-batch tensors")
    B = ts[0].cores[0].shape[0]
    for t in ts[1:]:
        if t.cores[0].shape[0] != B:
            raise ValueError(
                f"Batch sizes differ: {B} vs {t.cores[0].shape[0]}"
            )
    return [
        [
            tn.Tensor(
                [c[b] for c in t.cores],
                Us=[None if U is None else U[b] for U in t.Us],
            )
            for t in ts
        ]
        for b in range(B)
    ]


_neg_cache = None  # weakref.WeakKeyDictionary, created lazily


def _negated(function):
    """A negation wrapper CACHED per user function: cross()'s fused-chunk
    trace cache keys on id(function), so a fresh `lambda *x: -f(*x)` per
    maximum()/argmax() call (or per batch sample) would force a full XLA
    re-trace of the fused sweep every time."""
    global _neg_cache
    import weakref

    if _neg_cache is None:
        _neg_cache = weakref.WeakKeyDictionary()
    try:
        w = _neg_cache.get(function)
    except TypeError:  # unhashable callable
        w = None
    if w is None:
        def w(*x):
            return -function(*x)

        try:
            _neg_cache[function] = w
        except TypeError:
            pass
    return w


def _wrap_user_function(function, function_arg, detach_evaluations):
    """Apply the function_arg='matrix' and detach_evaluations wrappers — ONE
    definition shared by cross() and the batched-minimize path so the two
    call the user function with identical semantics."""
    if function_arg == "matrix":
        def f(*args):
            return function(jnp.concatenate([a[:, None] for a in args], axis=1))
    else:
        f = function
    if detach_evaluations:
        _g = f

        def f(*args):  # noqa: F811 — deliberate re-binding
            return jax.lax.stop_gradient(_g(*args))

    return f


def _grow_schedule(curRs, Is, rmax, kickrank):
    """Kickrank rank-growth recurrence — ONE definition shared by the fused,
    eager, and batched-minimize paths so their rank schedules (and therefore
    their rng streams) cannot desynchronize."""
    N = len(Is)
    newRs = curRs.copy()
    newRs[1:-1] = np.minimum(rmax, newRs[1:-1] + kickrank)
    for n in list(range(1, N)) + list(range(N - 1, 0, -1)):
        newRs[n] = min(newRs[n - 1] * Is[n - 1], newRs[n], Is[n] * newRs[n + 1])
    return newRs


def _stage_chunk(Rs, Is, S, rng, rmax, kickrank):
    """Stage one speculative chunk: the per-iteration rank schedule and the
    random kick rows (as device int32 arrays) for its S iterations. ONE
    definition shared by the fused cross loop and the batched-minimize loop
    — the two state machines must stay in lockstep (same `_grow_schedule`
    recurrence AND the same rng draw order) or their rank schedules and rng
    streams silently desynchronize. Returns (schedule, extras_chunk)."""
    N = len(Is)
    schedule = [Rs]
    extras_chunk = []
    if kickrank is not None:
        cur = Rs
        for _ in range(S - 1):
            newRs = _grow_schedule(cur, Is, rmax, kickrank)
            extra = _draw_extra(rng, Is, newRs)
            extras_chunk.append(tuple(
                jnp.asarray(extra[: newRs[n + 1] - cur[n + 1], n:],
                            dtype=jnp.int32)
                for n in range(N - 1)
            ))
            schedule.append(newRs)
            cur = newRs
    else:
        empty = tuple(
            jnp.zeros((0, N - n), dtype=jnp.int32) for n in range(N - 1)
        )
        extras_chunk = [empty] * (S - 1)
        schedule = [Rs] * S
    return schedule, extras_chunk


def _draw_extra(rng, Is, newRs):
    """Random kick rows for every interior edge, one rng draw per edge (the
    draw ORDER is part of the schedule contract shared across paths)."""
    N = len(Is)
    return np.hstack(
        [rng.integers(0, Is[n + 1], [max(newRs), 1]) for n in range(N - 1)]
        + [np.zeros([max(newRs), 1], dtype=int)]
    )


def _select_converged(epss, finites, eps, what):
    """Pick the first in-chunk iteration where EVERY sample's validation eps
    clears the target. Finiteness is checked in iteration order and only up
    to the selected iteration: speculative iterations past the convergence
    point may legitimately probe pivots where f blows up, exactly as the
    non-batched fused loop ignores them. Returns (sel, converged); raises
    ValueError on a non-finite pre-convergence iteration."""
    S = epss.shape[1]
    for s in range(S):
        if not finites[:, s].all():
            raise ValueError(
                "Invalid return value (NaN/Inf) from function {} during "
                "{}".format(what[0], what[1])
            )
        if (epss[:, s] < eps).all():
            return s, True
    return S - 1, False


# Telemetry for the one-stream batched minimize (white-box testability:
# asserts the ensemble min ran as ONE vmapped dispatch stream, not B loops,
# and whether the batch dimension was sharded over a mesh)
_BATCHED_MIN_STATS = {"onestream": False, "chunks": 0, "mesh_sharded": False}

# Speculative chunk depths for the fused sweep: the convergence check (one
# tunnel round trip) happens once per chunk, so depth trades wasted
# speculative iterations against host syncs. eps runs typically need >=4
# sweeps, so a deep first chunk wastes nothing; later chunks stay shallower
# because convergence can land anywhere inside them (the chunk result is
# truncated at the first converged in-chunk iteration either way). Swept on
# the warm 5-D Hilbert TPU run: (4,2) 57.5 ms, (6,2) 52.3, (6,4) 48.5,
# (8,4) 52.1, (10,6) 54.3 — (6,4) best on min and median (see PERF.md).
_CHUNK_DEPTH_FIRST = 6
_CHUNK_DEPTH_NEXT = 4


import contextlib


@contextlib.contextmanager
def _no_persistent_cache_on_cpu():
    """Skip the persistent compilation cache around a compile on the CPU
    backend.

    XLA:CPU's LoadedExecutable.serialize() ABORTS the process on the
    vmapped batched-minimize chunk executable (a vmapped program holding LU
    custom calls inside while_loops, optionally sharded over a mesh) in
    long test runs — observed repeatedly at cache-write time in the suite,
    on both full-mesh and submesh variants, while the same program compiles
    and runs fine. Skipping the persistent cache for just these programs
    costs a few seconds of recompilation per process and removes the crash;
    TPU and other backends are unaffected. Routed through the library's
    cache-guard layer (utils.suppress_persistent_cache) because jax's own
    enable flag is memoized process-globally at first use."""
    if jax.default_backend() != "cpu":
        yield
        return
    with tn.utils.suppress_persistent_cache():
        yield


def _try_batched_minimize(tensors, function, rmax, max_iter, verbose, kwargs):
    """One-stream batched ensemble minimize (VERDICT r3 next-round #3): vmap
    the fused LTR+RTL chunk program over the batch dim, so tn.minimum of a
    B-member ensemble issues ONE dispatch stream instead of B sequential
    crosses. Pivots differ per sample but shapes don't (fixed rmax schedule),
    so the whole sweep vmaps; the device maxvol while_loop body is
    convergence-guarded to be vmap-safe.

    With ``mesh=`` the BATCH dimension is sharded over the mesh's first
    axis (every batch-leading operand is placed with a
    ``PartitionSpec(axis)`` NamedSharding, so XLA partitions the whole
    vmapped sweep into B/D independent per-device crosses with no
    communication beyond the final gather) — the TPU-natural layout for an
    ensemble of independent pivot searches, unlike fiber sharding which
    would synchronize every QR.

    Returns (min (B,) jnp, argmin (B, N) np) or None when the inputs don't
    admit the vmapped path (non-traceable f, unknown kwargs, fuse=False, CPU
    under fuse='auto') — caller falls back to the per-sample loop, WARNING
    (via logger) whenever the reason is not the user's own explicit choice
    (VERDICT r4 next #4: a silent fallback discards the one-stream path and
    any sharding request together).
    """

    def _fallback(reason, warn):
        if warn and not kwargs.get("suppress_warnings"):
            logger.warning(
                "batched ensemble minimize: falling back to sequential "
                "per-sample crosses (%s); the one-stream vmapped path does "
                "not apply", reason,
            )
        return None

    supported = {"seed", "eps", "val_size", "kickrank", "function_arg",
                 "fuse", "detach_evaluations", "suppress_warnings",
                 "ranks_tt", "device", "mesh"}
    if not set(kwargs) <= supported:
        return _fallback(
            "unsupported kwargs: {}".format(sorted(set(kwargs) - supported)),
            warn=True,
        )
    fuse = kwargs.get("fuse", "auto")
    if fuse is False or fuse == "host":
        return None  # user's explicit choice: no warning
    if fuse in (None, "auto") and jax.default_backend() == "cpu":
        return None  # designed default on CPU (per-call retrace dominates)
    function_arg = kwargs.get("function_arg", "vectors")
    f = _wrap_user_function(
        function, function_arg, bool(kwargs.get("detach_evaluations"))
    )

    ts = list(tensors) if isinstance(tensors, (list, tuple)) else [tensors]
    ts = [t.decompress_tucker_factors(_clone=False) for t in ts]
    K = len(ts)
    dtype = ts[0].cores[0].dtype
    if not _f_is_traceable(f, K, dtype):
        return _fallback("the function is not jnp-traceable", warn=True)

    B = int(ts[0].cores[0].shape[0])
    Is = list(ts[0].shape)[1:]  # batch .shape leads with B
    N = len(Is)
    if N <= 1:
        return None
    eps = kwargs.get("eps", 1e-6)
    val_size = int(kwargs.get("val_size", 1000))
    kickrank = kwargs.get("kickrank", 3)
    ranks_tt = kwargs.get("ranks_tt")
    if ranks_tt is None:
        ranks_tt = 1
    else:
        kickrank = None
    if not hasattr(ranks_tt, "__len__"):
        ranks_tt = [ranks_tt] * (N - 1)
    Rs = np.array([1] + list(ranks_tt) + [1])
    for n in list(range(1, N)) + list(range(N - 1, -1, -1)):
        Rs[n] = min(Rs[n - 1] * Is[n - 1], Rs[n], Is[n] * Rs[n + 1])

    rng = np.random.default_rng(kwargs.get("seed"))
    randint = _draw_extra(rng, Is, Rs)
    # Shared initial random right index sets: each sample treats them as its
    # random kicks (shapes must be uniform for the vmap)
    rsets_b = [
        np.broadcast_to(randint[: Rs[n + 1], n:], (B,) + randint[: Rs[n + 1], n:].shape)
        for n in range(N - 1)
    ]
    Xs_val = jnp.asarray(
        np.stack([rng.choice(I, val_size) for I in Is], axis=1)
    )

    tcores = tuple(tuple(t.cores) for t in ts)  # each (B, ...) leading

    # mesh=: shard the BATCH dimension. Placing every batch-leading operand
    # with PartitionSpec(axis) lets XLA partition the whole vmapped chunk
    # into B/D independent per-device crosses — no collective anywhere in
    # the sweep (the samples never interact); the only cross-device traffic
    # is the final (B,) gather.
    mesh = kwargs.get("mesh")
    _put_b = lambda x: x  # noqa: E731 — identity when unsharded
    _BATCHED_MIN_STATS["mesh_sharded"] = False
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        nsh = int(mesh.devices.shape[0])
        ax = mesh.axis_names[0]
        if B % nsh == 0:
            def _put_b(x):
                return jax.device_put(
                    x,
                    NamedSharding(
                        mesh, PartitionSpec(*([ax] + [None] * (x.ndim - 1)))
                    ),
                )

            tcores = tuple(tuple(_put_b(c) for c in cs) for cs in tcores)
            Xs_val = jax.device_put(Xs_val, NamedSharding(mesh, PartitionSpec()))
            _BATCHED_MIN_STATS["mesh_sharded"] = True
        elif not kwargs.get("suppress_warnings"):
            logger.warning(
                "batched ensemble minimize: mesh= ignored (batch size %d "
                "is not divisible by mesh axis size %d); running the "
                "one-stream path unsharded", B, nsh,
            )

    # vmapped fused chunk: cores/mz/rcols/ys carry the leading B; schedule,
    # kick rows and validation coordinates are shared. Cached per function.
    key = (id(function), function_arg, bool(kwargs.get("detach_evaluations")),
           "batched_minimize")
    ent = _fused_iter_cache.get(key)
    if ent is None:
        base = functools.partial(_fused_chunk, f, None)
        vchunk = jax.jit(jax.vmap(
            base, in_axes=(0, 0, None, None, None, 0, 0)
        ))
        vchunk_first = jax.jit(jax.vmap(
            base, in_axes=(0, 0, None, None, None, 0, None)
        ))
        _fused_iter_cache[key] = ((vchunk_first, vchunk), f)
        if len(_fused_iter_cache) > 128:
            _fused_iter_cache.clear()
            _fused_seen_sigs.clear()
            _fused_iter_cache[key] = ((vchunk_first, vchunk), f)
    else:
        vchunk_first, vchunk = ent[0]

    mz = (
        _put_b(jnp.zeros((B,), dtype=dtype)),
        _put_b(jnp.zeros((B,), dtype=bool)),
        _put_b(jnp.zeros((B, N), dtype=jnp.int32)),
    )
    ys_dev = None
    converged = False
    i = 0
    _BATCHED_MIN_STATS["onestream"] = True
    _BATCHED_MIN_STATS["chunks"] = 0
    best = None
    argbest = None
    while i < max_iter and not converged:
        S = min(_CHUNK_DEPTH_FIRST if i == 0 else _CHUNK_DEPTH_NEXT, max_iter - i)
        schedule, extras_chunk = _stage_chunk(Rs, Is, S, rng, rmax, kickrank)
        rcols_b = tuple(
            _put_b(jnp.asarray(rsets_b[n][:, :, : N - 1 - n], dtype=jnp.int32))
            for n in range(N - 1)
        )
        fn = vchunk_first if ys_dev is None else vchunk
        with _no_persistent_cache_on_cpu():
            (outs, stats_dev, packed_rsets, _rints, mz_stack, ys_dev) = fn(
                tcores, rcols_b, None, tuple(extras_chunk), Xs_val, mz, ys_dev
            )
        _BATCHED_MIN_STATS["chunks"] += 1
        stats = np.asarray(stats_dev)  # (B, 2S): one sync per chunk
        epss, finites = stats[:, :S], stats[:, S:] > 0.5
        # The minimize state is cumulative so a later sel is never worse
        sel, conv = _select_converged(
            epss, finites, eps, (function, "batched cross-minimize")
        )
        converged = converged or conv
        if verbose:
            bvals = np.asarray(mz_stack[0][:, sel])
            print("batched minimize: iters {}..{} | best per sample: {}".format(
                i, i + sel, np.array2string(bvals, precision=6)))
        mz = (mz_stack[0][:, sel], mz_stack[1][:, sel], mz_stack[2][:, sel])
        best, has, argbest = mz
        i += sel + 1
        if converged or i >= max_iter:
            break
        packed = np.asarray(packed_rsets)  # (B, rows, N)
        rsets_b, off = [], 0
        for n in range(N - 1):
            R = int(schedule[-1][n + 1])
            rsets_b.append(packed[:, off:off + R, : N - n].astype(np.int64))
            off += R
        Rs = schedule[-1]
        if kickrank is not None:
            newRs = _grow_schedule(Rs, Is, rmax, kickrank)
            extra = _draw_extra(rng, Is, newRs)
            for n in range(N - 1):
                if newRs[n + 1] > Rs[n + 1]:
                    ext = np.broadcast_to(
                        extra[: newRs[n + 1] - Rs[n + 1], n:],
                        (B, newRs[n + 1] - Rs[n + 1], N - n),
                    )
                    rsets_b[n] = np.concatenate([rsets_b[n], ext], axis=1)
            Rs = newRs
    return jnp.asarray(best), np.asarray(argbest)


def minimum(tensors=None, function=lambda x: x, rmax=10, max_iter=10, verbose=False, **kwargs):
    """Estimate the minimum of a tensor / function of tensors.

    Reference cross.py:12-37. Batch tensors return a (B,) array of
    per-sample minima (beyond-parity; the reference rejects batch) — as ONE
    vmapped dispatch stream when the fused path admits it, else a loop."""
    samples = _split_batch_samples(tensors)
    if samples is not None:
        res = _try_batched_minimize(tensors, function, rmax, max_iter, verbose, kwargs)
        if res is not None:
            return res[0]
        return jnp.stack([
            jnp.asarray(minimum(s, function=function, rmax=rmax,
                                max_iter=max_iter, verbose=verbose, **kwargs))
            for s in samples
        ])
    _, info = cross(
        **kwargs, tensors=tensors, function=function, rmax=rmax, max_iter=max_iter,
        verbose=verbose, return_info=True, _minimize=True,
    )
    return info["min"]


def argmin(tensors=None, function=lambda x: x, rmax=10, max_iter=10, verbose=False, **kwargs):
    """Coordinates of the minimum.

    Reference cross.py:480-492. Batch tensors return a list of per-sample
    coordinate tuples (one vmapped stream when the fused path admits it)."""
    samples = _split_batch_samples(tensors)
    if samples is not None:
        res = _try_batched_minimize(tensors, function, rmax, max_iter, verbose, kwargs)
        if res is not None:
            return [tuple(int(x) for x in row) for row in res[1]]
        return [
            argmin(s, function=function, rmax=rmax, max_iter=max_iter,
                   verbose=verbose, **kwargs)
            for s in samples
        ]
    _, info = cross(
        **kwargs, tensors=tensors, function=function, rmax=rmax, max_iter=max_iter,
        verbose=verbose, return_info=True, _minimize=True,
    )
    return info["argmin"]


def maximum(tensors=None, function=lambda x: x, rmax=10, max_iter=10, verbose=False, **kwargs):
    """Maximum element, via minimize of -t.

    Reference cross.py:495-507. Batch tensors return a (B,) array of
    per-sample maxima (one vmapped stream when the fused path admits it)."""
    samples = _split_batch_samples(tensors)
    if samples is not None:
        res = _try_batched_minimize(
            tensors, _negated(function), rmax, max_iter, verbose, kwargs
        )
        if res is not None:
            return -res[0]
        return jnp.stack([
            jnp.asarray(maximum(s, function=function, rmax=rmax,
                                max_iter=max_iter, verbose=verbose, **kwargs))
            for s in samples
        ])
    _, info = cross(
        **kwargs, function=_negated(function), tensors=tensors, rmax=rmax,
        max_iter=max_iter, verbose=verbose, return_info=True, _minimize=True,
    )
    return -info["min"]


def argmax(tensors=None, function=lambda x: x, rmax=10, max_iter=10, verbose=False, **kwargs):
    """Coordinates of the maximum.

    Reference cross.py:510-522. Batch tensors return a list of per-sample
    coordinate tuples (one vmapped stream when the fused path admits it)."""
    samples = _split_batch_samples(tensors)
    if samples is not None:
        res = _try_batched_minimize(
            tensors, _negated(function), rmax, max_iter, verbose, kwargs
        )
        if res is not None:
            return [tuple(int(x) for x in row) for row in res[1]]
        return [
            argmax(s, function=function, rmax=rmax, max_iter=max_iter,
                   verbose=verbose, **kwargs)
            for s in samples
        ]
    _, info = cross(
        **kwargs, tensors=tensors, function=_negated(function), rmax=rmax,
        max_iter=max_iter, verbose=verbose, return_info=True, _minimize=True,
    )
    return info["argmin"]


# ---------------------------------------------------------------------------
# Jitted step kernels. jax.jit caches one executable per shape bucket, so the
# sweep's inner loop costs a handful of XLA dispatches instead of dozens of
# eagerly traced gathers/einsums per step (the dominant cost of this
# algorithm — the FLOPs themselves are tiny).
# ---------------------------------------------------------------------------


@jax.jit
def _val_forward(cores, X):
    """Validation-set TT evaluation. Module-level jit: re-wrapping
    jax.jit(...) per call would re-TRACE every iteration (each wrapper has
    its own cache; only the XLA compile step is shared)."""
    from tntorch_tpu.parallel.mesh import tt_batch_forward

    return tt_batch_forward(list(cores), X)


@jax.jit
def _rchain(cores_tail, idx):
    """Right interface chain: contract cores j+1..N-1 at the index rows."""
    with jax.default_matmul_precision("highest"):
        return _rchain_body(cores_tail, idx)


def _rchain_body(cores_tail, idx):
    P = idx.shape[0]
    M = jnp.ones((cores_tail[-1].shape[-1], P), dtype=cores_tail[-1].dtype)
    for n in range(len(cores_tail) - 1, -1, -1):
        c = cores_tail[n]
        if c.ndim == 3:  # TT core
            M = jnp.einsum("iaj,ja->ia", c[:, idx[:, n], :], M)
        else:  # CP factor
            M = jnp.einsum("ai,ia->ia", c[idx[:, n], :], M)
    return M


@jax.jit
def _fibers(lint, core, rint):
    """Evaluate the (Rl x I x Rr) fiber tensor of one input TT/CP core."""
    with jax.default_matmul_precision("highest"):
        return _fibers_body(lint, core, rint)


def _fibers_body(lint, core, rint):
    if core.ndim == 3:
        V = jnp.einsum("ai,ibj,jc->abc", lint, core, rint)
    else:
        V = jnp.einsum("ai,bi,ic->abc", lint, core, rint)
    return V.reshape(-1)


@jax.jit
def _qr_q(V):
    return jnp.linalg.qr(V)[0]


def _minimize_step_body(evaluation, best, has_best, argbest, lset_j, rset_j):
    """Device-resident minimize bookkeeping for one sweep step: apply
    Oseledets' atan transform (shifted by the running best) and fold the
    step's candidate minimum + its full coordinate vector into the carried
    state — no host sync (the reference ships every step to NumPy,
    cross.py:342-359). Traceable body: used by the eager per-step jit below
    AND inline inside the fused iteration program."""
    ev = jnp.pi / 2 - jnp.arctan(evaluation - best)
    k = jnp.argmax(ev)
    eval_min = jnp.tan(jnp.pi / 2 - ev[k]) + best
    Rl = lset_j.shape[0]
    Rr = rset_j.shape[0]
    I = evaluation.shape[0] // (Rl * Rr)
    r0 = k // (I * Rr)
    i = (k % (I * Rr)) // Rr
    r1 = k % Rr
    coords = jnp.concatenate(
        [
            lset_j[r0, 1:].astype(jnp.int32),
            jnp.asarray(i, jnp.int32)[None],
            rset_j[r1, :-1].astype(jnp.int32),
        ]
    )
    better = jnp.logical_or(jnp.logical_not(has_best), eval_min < best)
    best = jnp.where(better, eval_min, best)
    argbest = jnp.where(better, coords, argbest)
    return ev, best, jnp.ones((), bool), argbest


_minimize_step = jax.jit(_minimize_step_body)


@jax.jit
def _interp(Q, local):
    """Interpolation core: rows `local` become the identity."""
    with jax.default_matmul_precision("highest"):
        return jnp.linalg.solve(Q[local, :].T, Q.T).T


@jax.jit
def _lint_update(lint, core, local_r, local_i):
    with jax.default_matmul_precision("highest"):
        if core.ndim == 3:
            return jnp.einsum("ai,iaj->aj", lint[local_r, :], core[:, local_i, :])
        return jnp.einsum("ai,ai->ai", lint[local_r, :], core[local_i, :])


@jax.jit
def _rint_update(core, rint, local_i, local_r):
    with jax.default_matmul_precision("highest"):
        if core.ndim == 3:
            return jnp.einsum("iaj,ja->ia", core[:, local_i, :], rint[:, local_r])
        return jnp.einsum("ai,ia->ia", core[local_i, :], rint[:, local_r])


def init_interfaces(tensors, rsets, N):
    """Left/right interface chains for each input tensor (reference cross.py:113-135)."""
    t_linterfaces = []
    t_rinterfaces = []
    for t in tensors:
        dtype = t.cores[0].dtype
        linterfaces = [jnp.ones((1, int(t.ranks_tt[0])), dtype=dtype)] + [None] * (N - 1)
        rinterfaces = [None] * (N - 1) + [
            jnp.ones((int(t.ranks_tt[t.dim()]), 1), dtype=dtype)
        ]
        for j in range(N - 1):
            rinterfaces[j] = _rchain(
                tuple(t.cores[j + 1:]), jnp.asarray(rsets[j][:, : N - 1 - j])
            )
        t_linterfaces.append(linterfaces)
        t_rinterfaces.append(rinterfaces)
    return t_linterfaces, t_rinterfaces


# ---------------------------------------------------------------------------
# Fused sweep: one XLA program per rank bucket runs the ENTIRE iteration
# (LTR + RTL sweeps: fiber einsums, f, QR, on-device maxvol pivoting,
# interpolation solves, interface updates, validation error), so a whole
# cross iteration costs ONE dispatch + one scalar sync instead of
# ~5 x (2N-1) kernel dispatches. Used when f is jnp-traceable (VERDICT.md
# round-2 item 2; the per-step kernels above remain the fallback for
# minimize / record_samples / sharded-fiber / non-traceable-f modes).
# ---------------------------------------------------------------------------


def _fused_rinterfaces(tensor_cores, rsets_cols):
    """All right-interface chains in one program (fused init_interfaces)."""
    outs = []
    with jax.default_matmul_precision("highest"):
        for cores in tensor_cores:
            rints = []
            for j in range(len(cores) - 1):
                rints.append(_rchain_body(cores[j + 1:], rsets_cols[j]))
            outs.append(tuple(rints))
    return tuple(outs)


_fused_rinterfaces_jit = jax.jit(_fused_rinterfaces)


def _fused_iteration_body(f, tensor_cores, rints_in, Xs_val_mat, ys_val, norm_ys_val,
                          mz=None, rsets_rows=None, fiber_sharding=None):
    """One full LTR+RTL cross iteration, fully traceable (caller supplies the
    matmul-precision context).

    :param tensor_cores: tuple (per input tensor) of tuples of cores
    :param rints_in: tuple (per input tensor) of tuples of right interfaces
        for modes 0..N-1 (mode N-1's incoming rint is the terminal ones)
    :param mz: minimize state (best, has_best, argbest) carried across
        steps/iterations, or None for a plain approximation sweep. When set,
        every evaluation goes through the atan transform with the running
        best, and maxvol runs 10 iterations (reference rect_maxvol's
        start_maxvol_iters).
    :param fiber_sharding: optional NamedSharding placed (via
        lax.with_sharding_constraint) on each step's flattened fiber arrays
        BEFORE calling f, so the embarrassingly parallel function evaluations
        (SURVEY.md section 2c; reference cross.py:316-379) run SPMD over the
        mesh while the small pivoting stays replicated — fiber parallelism on
        the fused hot path (VERDICT r3 missing #1).
    :return: (cores, lsets, rsets, left_locals, lints, rints, val_eps,
        finite, mz)
    """
    from tntorch_tpu.parallel.mesh import tt_batch_forward

    K = len(tensor_cores)
    N = len(tensor_cores[0])
    dtype = tensor_cores[0][0].dtype
    # Static mode sizes / ranks come from the rint shapes
    Is = [c.shape[1] if c.ndim == 3 else c.shape[0] for c in tensor_cores[0]]
    Rs = [1] + [r.shape[-1] for r in rints_in[0][:-1]] + [1]

    # Leading interface width: left TT rank for 3D cores, the CP rank
    # (axis 1) for 2D CP cores — mirrors eager init_interfaces' ranks_tt[0]
    lints = [
        [jnp.ones((1, c0.shape[0] if c0.ndim == 3 else c0.shape[1]), dtype=dtype)]
        + [None] * (N - 1)
        for c0 in (tensor_cores[k][0] for k in range(K))
    ]
    rints = [list(r) for r in rints_in]
    lsets = [jnp.zeros((1, 1), dtype=jnp.int32)] + [None] * (N - 1)
    if rsets_rows is not None:
        # Minimize needs the INCOMING right index rows (the LTR transform
        # reads rsets[j] before this iteration's RTL rebuilds it)
        rsets = list(rsets_rows)[: N - 1] + [jnp.zeros((1, 1), dtype=jnp.int32)]
    else:
        rsets = [None] * (N - 1) + [jnp.zeros((1, 1), dtype=jnp.int32)]
    cores = [None] * N
    left_locals = []
    finite = jnp.asarray(True)

    mv_iters = 10 if mz is not None else 100
    if fiber_sharding is not None:
        _n_fiber_shards = int(
            np.prod([fiber_sharding.mesh.shape[a]
                     for a in fiber_sharding.spec if a is not None])
        )

    def evaluate(j):
        nonlocal mz
        Xs = [_fibers_body(lints[k][j], tensor_cores[k][j], rints[k][j]) for k in range(K)]
        if fiber_sharding is not None and Xs[0].shape[0] % _n_fiber_shards == 0:
            # Fiber-parallel SPMD: the P = Rl*I*Rr sample points spread over
            # the mesh for f; the QR/maxvol below stay on the replicated V
            Xs = [jax.lax.with_sharding_constraint(x, fiber_sharding) for x in Xs]
        ev = f(*Xs)
        if ev.ndim == 2:
            ev = ev[:, 0]
        if mz is not None:
            best, has, argbest = mz
            ev, best, has, argbest = _minimize_step_body(
                ev, best, has, argbest, lsets[j], rsets[j]
            )
            mz = (best, has, argbest)
        return ev.reshape(Rs[j], Is[j], Rs[j + 1]), jnp.isfinite(ev).all()

    # Left-to-right
    for j in range(N - 1):
        V, ok = evaluate(j)
        finite = finite & ok
        Q = jnp.linalg.qr(V.reshape(-1, Rs[j + 1]))[0]
        if Q.shape[0] <= Q.shape[1]:
            lj = jnp.arange(Q.shape[0], dtype=jnp.int32)
        else:
            lj, _ = _maxvol_device_impl(Q, 1.05, mv_iters)
        lr, li = lj // Is[j], lj % Is[j]
        cores[j] = jnp.linalg.solve(Q[lj, :].T, Q.T).T.reshape(Rs[j], Is[j], Rs[j + 1])
        left_locals.append(lj)
        lsets[j + 1] = jnp.concatenate(
            [lsets[j][lr], li[:, None].astype(jnp.int32)], axis=1
        )
        for k in range(K):
            c = tensor_cores[k][j]
            if c.ndim == 3:
                lints[k][j + 1] = jnp.einsum("ai,iaj->aj", lints[k][j][lr, :], c[:, li, :])
            else:
                lints[k][j + 1] = jnp.einsum("ai,ai->ai", lints[k][j][lr, :], c[li, :])

    # Right-to-left
    for j in range(N - 1, 0, -1):
        V, ok = evaluate(j)
        finite = finite & ok
        Q = jnp.linalg.qr(V.reshape(Rs[j], -1).T)[0]
        if Q.shape[0] <= Q.shape[1]:
            lj = jnp.arange(Q.shape[0], dtype=jnp.int32)
        else:
            lj, _ = _maxvol_device_impl(Q, 1.05, mv_iters)
        li, lr = lj // Rs[j + 1], lj % Rs[j + 1]
        cores[j] = jnp.linalg.solve(Q[lj, :].T, Q.T).reshape(Rs[j], Is[j], Rs[j + 1])
        rsets[j - 1] = jnp.concatenate(
            [li[:, None].astype(jnp.int32), rsets[j][lr]], axis=1
        )
        for k in range(K):
            c = tensor_cores[k][j]
            if c.ndim == 3:
                rints[k][j - 1] = jnp.einsum("iaj,ja->ia", c[:, li, :], rints[k][j][:, lr])
            else:
                rints[k][j - 1] = jnp.einsum("ai,ia->ia", c[li, :], rints[k][j][:, lr])

    V, ok = evaluate(0)
    finite = finite & ok
    cores[0] = V

    pred = tt_batch_forward(cores, Xs_val_mat)
    val_eps = jnp.linalg.norm(ys_val - pred) / norm_ys_val
    return (
        tuple(cores), tuple(lsets), tuple(rsets), tuple(left_locals),
        tuple(tuple(l) for l in lints), tuple(tuple(r) for r in rints),
        val_eps, finite, mz,
    )


def _eval_points_body(tensor_cores, X):
    """Evaluate each input tensor (TT/CP hybrid cores) at integer points X
    (P x N) — the compressed fancy-index diagonal, as one traced program."""
    from tntorch_tpu.utils import take_mode

    outs = []
    with jax.default_matmul_precision("highest"):
        for cores in tensor_cores:
            P0 = X.shape[0]
            r0 = cores[0].shape[0] if cores[0].ndim == 3 else 1
            v = jnp.ones((P0, r0), dtype=cores[0].dtype)
            for n, c in enumerate(cores):
                if c.ndim == 3:
                    v = jnp.einsum("br,rbs->bs", v, take_mode(c, X[:, n]))
                else:  # CP factor acts as a diagonal core
                    v = v * c[X[:, n], :]
            outs.append(v.sum(axis=1) if cores[-1].ndim == 2 else v[:, 0])
    return tuple(outs)


_eval_points_jit = jax.jit(_eval_points_body)


def _fused_chunk(f, fiber_sharding, tensor_cores, rcols, rints_in, extras, Xs_val_mat,
                 mz0=None, ys_val_in=None):
    """Run len(extras)+1 cross iterations as ONE traced program, growing the
    ranks on-device between them (speculative execution: the convergence
    check happens on the host only once per chunk, so the tunnel round-trip
    latency is paid per chunk instead of per iteration). The validation
    targets and the initial right interfaces are also computed in-program —
    the host stages only index sets.

    :param rcols: per-mode rset index columns to derive the initial right
        interfaces from, or None to use `rints_in` directly
    :param rints_in: carried right interfaces (used when rcols is None)
    :param extras: tuple (one per growth) of per-mode int32 arrays with the
        extra random rset rows appended by kickrank (0-row arrays = no growth)
    :return: (per-iteration (cores, lsets, rsets, left_locals) tuples,
        stats [eps_0..eps_{S-1}, finite_0..finite_{S-1}] as ONE array (so the
        host convergence check costs a single transfer), the final
        iteration's rsets packed into one int32 matrix, final rints)
    """
    with jax.default_matmul_precision("highest"):
        K = len(tensor_cores)
        N = len(tensor_cores[0])
        dtype0 = tensor_cores[0][0].dtype
        if ys_val_in is None:
            # First chunk: evaluate the validation targets in-program; later
            # chunks receive them as a carried device array (re-evaluating f
            # at val_size points per chunk would be pure waste)
            ys_val = f(*_eval_points_body(tensor_cores, Xs_val_mat))
            if ys_val.ndim == 2:
                ys_val = ys_val[:, 0]
        else:
            ys_val = ys_val_in
        norm_ys_val = jnp.linalg.norm(ys_val)
        if rcols is not None:
            base = _fused_rinterfaces(tensor_cores, rcols)
            rints = tuple(
                base[k]
                + (jnp.ones((tensor_cores[k][-1].shape[-1], 1), dtype=dtype0),)
                for k in range(K)
            )
        else:
            rints = rints_in
        terminals = tuple(rints[k][-1] for k in range(K))
        minimize = mz0 is not None
        mz = mz0
        if minimize:
            # Incoming right index rows for the first iteration's transform:
            # rows = staged columns + the terminal zero column
            assert rcols is not None, "fused minimize always stages rcols"
            rsets_rows = tuple(
                jnp.concatenate(
                    [rcols[n], jnp.zeros((rcols[n].shape[0], 1), jnp.int32)], axis=1
                )
                for n in range(N - 1)
            )
        else:
            rsets_rows = None
        outs = []
        epss = []
        finites = []
        mz_hist = []
        for s in range(len(extras) + 1):
            (cores, lsets, rsets, ll, _lints, rints_out, val_eps,
             finite, mz) = _fused_iteration_body(
                f, tensor_cores, rints, Xs_val_mat, ys_val, norm_ys_val,
                mz=mz, rsets_rows=rsets_rows, fiber_sharding=fiber_sharding,
            )
            outs.append((cores, lsets, rsets, ll))
            epss.append(val_eps.astype(jnp.float32))
            finites.append(finite)
            if minimize:
                mz_hist.append(mz)
            if s == len(extras):
                rints = rints_out
            elif all(e.shape[0] == 0 for e in extras[s]):
                rints = rints_out  # no growth: carry interfaces directly
                if minimize:
                    rsets_rows = tuple(rsets[: N - 1])
            else:
                new_rsets = list(rsets)
                for n in range(N - 1):
                    if extras[s][n].shape[0]:
                        new_rsets[n] = jnp.concatenate(
                            [rsets[n], extras[s][n].astype(rsets[n].dtype)], axis=0
                        )
                grow_cols = tuple(new_rsets[n][:, : N - 1 - n] for n in range(N - 1))
                base = _fused_rinterfaces(tensor_cores, grow_cols)
                rints = tuple(base[k] + (terminals[k],) for k in range(K))
                if minimize:
                    rsets_rows = tuple(new_rsets[: N - 1])
        stats = jnp.concatenate(
            [jnp.stack(epss), jnp.stack(finites).astype(jnp.float32)]
        )
        packed_rsets = jnp.concatenate(
            [jnp.pad(r, ((0, 0), (0, N - r.shape[1]))) for r in outs[-1][2][:-1]],
            axis=0,
        )
        if minimize:
            mz_stack = (
                jnp.stack([m[0] for m in mz_hist]),
                jnp.stack([m[1] for m in mz_hist]),
                jnp.stack([m[2] for m in mz_hist]),
            )
        else:
            mz_stack = None
        return tuple(outs), stats, packed_rsets, rints, mz_stack, ys_val


def _get_fused_chunk(f, cache_key=None, fiber_sharding=None):
    """jit wrapper for _fused_chunk, cached so repeated cross() calls with
    the same user function reuse traces/executables.

    ``cache_key`` identifies the USER's function plus the wrapper flags —
    keying on id(f) alone would miss whenever cross() wraps the user
    function in a fresh closure (function_arg='matrix' /
    detach_evaluations), forcing a full re-trace per call. The fiber
    sharding (mesh placement) is part of the key: the same function traced
    with and without sharding constraints compiles to different programs."""

    key = (cache_key if cache_key is not None else id(f), fiber_sharding)
    ent = _fused_iter_cache.get(key)
    if ent is None:
        fn = jax.jit(functools.partial(_fused_chunk, f, fiber_sharding))
        if len(_fused_iter_cache) > 128:
            _fused_iter_cache.clear()
            _fused_seen_sigs.clear()  # ids may be reused by new wrappers
        # Keep f (and through its closure, the user function) alive so any
        # id() component of the key stays valid
        _fused_iter_cache[key] = (fn, f)
        return fn
    return ent[0]


_fused_iter_cache: dict = {}

# Argument signatures already traced+compiled per fused-chunk wrapper: a
# first-seen signature's wall time is XLA compile, not evaluation, and is
# booked to info["compile_time"] instead of info["eval_time"]
_fused_seen_sigs: set = set()


def _arg_sig(fn_id, args):
    """Hashable (treedef, shapes/dtypes) signature of a jitted call's inputs."""
    leaves, treedef = jax.tree_util.tree_flatten(args)
    return (
        fn_id,
        str(treedef),
        tuple(
            (getattr(l, "shape", None), str(getattr(l, "dtype", type(l))))
            for l in leaves
        ),
    )


def _f_is_traceable(f, K, dtype):
    """Probe whether f can be traced on abstract fiber arrays."""
    try:
        jax.eval_shape(
            lambda xs: f(*xs), [jax.ShapeDtypeStruct((17,), dtype)] * K
        )
        return True
    except Exception:
        return False


_callback_support: dict = {}  # backend platform name -> bool (probed once)


def _backend_supports_callbacks():
    """Whether the default backend can run jax.pure_callback inside jit.

    Probed at runtime because it is a PJRT-plugin property, not a platform
    property: CPU/GPU/real-TPU runtimes support host send/recv callbacks, but
    tunneled/proxy plugins (e.g. axon_pjrt) raise UNIMPLEMENTED. The probe is
    one tiny jitted program, cached per backend for the process lifetime."""
    backend = jax.default_backend()
    sup = _callback_support.get(backend)
    if sup is None:
        try:
            out = jax.jit(lambda x: jax.pure_callback(
                lambda a: np.asarray(a) + np.float32(1.0),
                jax.ShapeDtypeStruct((), jnp.float32), x,
            ))(jnp.zeros((), jnp.float32))
            sup = bool(np.asarray(out) == 1.0)
        except Exception:
            sup = False
        _callback_support[backend] = sup
    return sup


def _make_callback_f(f, tensors, dtype):
    """Wrap a non-traceable (host NumPy) function in ``jax.pure_callback`` so
    it can be embedded in the fused chunk program: everything around the host
    f (fiber einsums, QR, on-device maxvol, interpolation solves, validation)
    stays ONE XLA program with streaming host callbacks, instead of ~5
    dispatches x (2N-1) steps per iteration through the device tunnel
    (VERDICT r3 missing #2; the reference's flagship domain-callback usage,
    /root/reference/tntorch/cross.py:334).

    Probes f once on real fiber values (2 points evaluated from the input
    tensors) to verify host-call semantics and the output shape; returns
    None when the probe fails, and the caller falls back to the eager path
    (which calls f on concrete arrays and so supports any semantics)."""
    if not _backend_supports_callbacks():
        return None
    N = len(tensors[0].shape)
    np_dtype = np.dtype(dtype)
    try:
        probe_X = jnp.zeros((2, N), dtype=jnp.int32)
        xs = _eval_points_jit(tuple(tuple(t.cores) for t in tensors), probe_X)
        out = np.asarray(f(*[np.asarray(x) for x in xs]))
        if out.ndim == 2 and out.shape[1] == 1:
            out = out[:, 0]
        if out.shape != (2,):
            return None
    except Exception:
        return None

    def _host(*arrs):
        res = np.asarray(f(*[np.asarray(a) for a in arrs]))
        if res.ndim == 2 and res.shape[1] == 1:
            res = res[:, 0]
        return np.ascontiguousarray(res, dtype=np_dtype)

    def f_cb(*Xs):
        return jax.pure_callback(
            _host, jax.ShapeDtypeStruct(Xs[0].shape, Xs[0].dtype), *Xs
        )

    return f_cb


def cross(
    function: Callable = lambda x: x,
    domain=None,
    tensors=None,
    function_arg: str = "vectors",
    ranks_tt: Union[int, Sequence[int], None] = None,
    kickrank: Optional[int] = 3,
    rmax: int = 100,
    eps: float = 1e-6,
    max_iter: int = 25,
    val_size: int = 1000,
    verbose: bool = True,
    return_info: bool = False,
    record_samples: bool = False,
    _minimize: bool = False,
    device: Any = None,
    suppress_warnings: bool = False,
    detach_evaluations: bool = False,
    seed: Optional[int] = None,
    mesh=None,
    fuse: Union[str, bool, None] = "auto",
):
    """Sample a black-box function on fibers chosen by maxvol pivoting and
    return an N-dimensional TT approximation (reference cross.py:138-529).

    Accepts either a `domain` (list of N grid vectors) with a function
    R^N -> R, or a list of K equal-shaped tensors with a function R^K -> R.

    :param mesh: optional jax.sharding.Mesh — the per-step fiber evaluations
        (embarrassingly parallel across the Rs[j] x I x Rs[j+1] sample points,
        SURVEY.md section 2c) are sharded over the mesh's first axis before
        calling `function`. Composes with the fused path: inside the fused
        chunk program the fiber arrays carry sharding constraints, so the
        f-evaluations run SPMD while QR/maxvol pivoting stays replicated.
    :param fuse: "auto" (default) fuses each full LTR+RTL sweep into ONE
        jitted XLA program when running on an accelerator — one dispatch +
        one scalar sync per iteration. A jnp-traceable `function` fuses
        directly; a host/NumPy function is embedded via jax.pure_callback
        (streaming host callbacks inside the one program) when a probe call
        succeeds, else the eager path runs. True forces fusion (e.g. on
        CPU), False disables it. "host" forces the NumPy host sweep
        (cross_host.py: fiber einsums, CholeskyQR2, native C++ maxvol, all
        on the host next to f) — the path taken automatically for a
        host-locked f on a backend that cannot host callbacks.

        Host-function caveats: deciding fusability calls `function` TWICE
        on the grid point at index (0, ..., 0) (these probe evaluations are
        not counted in info["nsamples"]); a host function with observable
        side effects, or one that raises on that point (e.g. a domain
        guard), should pass fuse=False — a probe failure silently selects
        the eager path (info["fused"] is False). With mesh=, host-callback
        functions run on one host device (info["callback"] True, fiber
        sharding dropped); only jnp-traceable functions evaluate SPMD.
    """
    rng = np.random.default_rng(seed)

    assert domain is not None or tensors is not None
    assert function_arg in ("vectors", "matrix")
    f = _wrap_user_function(function, function_arg, detach_evaluations)

    if tensors is None:
        tensors = tn.meshgrid(domain)
    if not hasattr(tensors, "__len__"):
        tensors = [tensors]
    if any(t.batch for t in tensors):
        # Batch input (beyond-parity; the reference rejects it,
        # cross.py:256-258): adaptive pivot sets are data-dependent per
        # sample, so samples run as independent crosses and the results
        # stack at zero-padded common ranks. This makes the whole
        # cross-based elementwise family (exp, /, **, cumprod, ...) work
        # on ensembles.
        if _minimize:
            raise ValueError(
                "Batched cross does not support _minimize directly; use "
                "tn.minimum/maximum/argmin/argmax (batch-aware)"
            )
        samples = _split_batch_samples(tensors)
        outs = []
        infos = []
        for b, sample_tensors in enumerate(samples):
            r = cross(
                function=function,
                tensors=sample_tensors,
                function_arg=function_arg,
                ranks_tt=ranks_tt,
                kickrank=kickrank,
                rmax=rmax,
                eps=eps,
                max_iter=max_iter,
                val_size=val_size,
                verbose=verbose,
                return_info=return_info,
                record_samples=record_samples,
                device=device,
                suppress_warnings=suppress_warnings,
                detach_evaluations=detach_evaluations,
                seed=None if seed is None else seed + b,
                mesh=mesh,
                fuse=fuse,
            )
            if return_info:
                r, inf = r
                infos.append(inf)
            outs.append(r)
        stacked = tn.stack(outs)  # zero-padded common ranks (tools.stack)
        if return_info:
            # Per-sample info dicts (pivot sets are data-dependent per
            # sample, so there is no meaningful stacked form)
            return stacked, infos
        return stacked
    tensors = [t.decompress_tucker_factors(_clone=False) for t in tensors]
    Is = list(tensors[0].shape)
    N = len(Is)

    # Process and cap ranks
    if ranks_tt is None:
        ranks_tt = 1
    else:
        kickrank = None
    if not hasattr(ranks_tt, "__len__"):
        ranks_tt = [ranks_tt] * (N - 1)
    ranks_tt = [1] + list(ranks_tt) + [1]
    Rs = np.array(ranks_tt)
    for n in list(range(1, N)) + list(range(N - 1, -1, -1)):
        Rs[n] = min(Rs[n - 1] * Is[n - 1], Rs[n], Is[n] * Rs[n + 1])

    dtype = tensors[0].cores[0].dtype
    # Placeholder cores: every entry is overwritten during the first sweep
    # (LTR writes 0..N-2, RTL N-1..1, final eval writes 0), so keep the draws
    # host-side (rng stream parity) and skip N device transfers.
    cores = [
        np.asarray(rng.standard_normal((Rs[n], Is[n], Rs[n + 1])), dtype=np.dtype(dtype))
        for n in range(N)
    ]

    # Left and right index sets
    lsets = [np.array([[0]])] + [None] * (N - 1)
    randint = _draw_extra(rng, Is, Rs)
    rsets = [randint[: Rs[n + 1], n:] for n in range(N - 1)] + [np.array([[0]])]

    # Fused-sweep fast path: whole LTR+RTL iteration chunks as one XLA
    # program. "auto" = on accelerators (on CPU the per-call retrace
    # outweighs the dispatch savings); True/False force it; "host" forces
    # the NumPy host sweep (cross_host.py). N == 1 has no interior rank
    # edges (the chunk's rset packing is degenerate, and a 1-mode cross is
    # one evaluation anyway). mesh= composes: the fiber arrays get sharding
    # constraints inside the chunk program.
    K = len(tensors)
    dtype = tensors[0].cores[0].dtype
    _host_req = fuse == "host"
    if _host_req:
        want_fuse = False
    elif fuse is None or fuse == "auto":
        want_fuse = (
            not record_samples and N > 1 and jax.default_backend() != "cpu"
        )
    else:
        want_fuse = bool(fuse) and not record_samples and N > 1
    _callback = False
    _host_pin = False
    _host_mode = False
    _f_traceable = None  # probed at most once (the probe calls f on tracers)
    if want_fuse:
        _f_traceable = _f_is_traceable(f, K, dtype)
    if want_fuse and not _f_traceable:
        # Host/NumPy function: embed it via pure_callback so the rest of the
        # sweep still fuses; fall back to the eager path if the probe fails
        f_cb = _make_callback_f(f, tensors, dtype)
        if f_cb is None:
            want_fuse = False
        else:
            f = f_cb
            _callback = True
    if not want_fuse and not _callback and not _minimize and N > 1 \
            and np.dtype(dtype).kind == "f" \
            and (_host_req
                 or (jax.default_backend() != "cpu"
                     and not (_f_traceable if _f_traceable is not None
                              else _f_is_traceable(f, K, dtype))
                     and not _backend_supports_callbacks())):
        # NumPy host sweep (cross_host.py): the whole sweep — fiber einsums,
        # CholeskyQR2, native maxvol pivoting — runs in NumPy/BLAS/C++ next
        # to the host-locked f. Measured ~4x the JAX-on-host "host-pin"
        # eager sweep below on the reference's flagship domain-callback
        # config (see PERF.md "host callback cross").
        _host_mode = True
    elif not want_fuse and not _callback and jax.default_backend() != "cpu" \
            and not _f_is_traceable(f, K, dtype) \
            and not _backend_supports_callbacks():
        # Host-locked f on a backend without host callbacks (e.g. a tunneled
        # PJRT plugin raises UNIMPLEMENTED for pure_callback): the eager path
        # would ship every fiber batch down and every evaluation back up per
        # step — ~10 MB each way per interior step through the tunnel.
        # Commit the input cores to the LOCAL CPU device instead: JAX
        # placement then keeps the whole eager sweep (interface einsums, QR,
        # maxvol, lstsq) on host next to f, and only the final cores move to
        # the accelerator. Measured through the axon tunnel: 0.9M -> host-
        # local evals/s on the reference's flagship domain-callback config.
        # Gated on callback support, NOT just on the eager path being taken:
        # when the backend can host callbacks and the user explicitly chose
        # eager (fuse=False / record_samples=True), the sweep stays on the
        # accelerator as selected.
        _host_dev = jax.devices("cpu")[0]
        _host_pin = True
        tensors = [
            tn.Tensor([jax.device_put(c, _host_dev) for c in t.cores])
            for t in tensors
        ]
    fused = want_fuse

    # Validation set
    Xs_val = [np.asarray(rng.choice(I, int(val_size))) for I in Is]
    Xs_val_mat = jnp.asarray(np.stack(Xs_val, axis=1))
    if not fused and not _host_mode:
        # One jitted program evaluates all K input tensors at the validation
        # points (the eager fancy-indexing path costs dozens of dispatches).
        # The fused path computes the targets inside the chunk program.
        ys_val = f(*_eval_points_jit(tuple(tuple(t.cores) for t in tensors), Xs_val_mat))
        if ys_val.ndim > 1:
            assert ys_val.ndim == 2
            assert ys_val.shape[1] == 1
            ys_val = ys_val[:, 0]
        assert len(ys_val) == val_size
        norm_ys_val = jnp.linalg.norm(ys_val)

    if verbose:
        print(
            "Cross-approximation over a {}D domain containing {:g} grid points:".format(
                N, tensors[0].numel()
            )
        )
    start = time.time()
    converged = False

    info = {"nsamples": 0, "eval_time": 0, "compile_time": 0, "val_epss": [],
            "min": 0, "argmin": None, "fused": fused, "callback": _callback,
            "host_pinned": _host_pin, "host_sweep": _host_mode}
    if record_samples:
        # One column per INPUT TENSOR (= per coordinate in domain mode,
        # where the inputs are the meshgrid tensors; the reference sized
        # this (0, N) and crashed whenever len(tensors) != N)
        info["sample_positions"] = np.zeros((0, len(tensors)))
        info["sample_values"] = np.zeros(0)

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        _fiber_sharding = NamedSharding(mesh, PartitionSpec(mesh.axis_names[0]))
        _n_shards = mesh.devices.shape[0]
    else:
        _fiber_sharding = None

    if fused:
        tcores = tuple(tuple(t.cores) for t in tensors)
        _fused_sharding = _fiber_sharding
        if _callback and _fused_sharding is not None:
            # A pure_callback is pinned by XLA to one maximal device:
            # sharding the fibers feeding it buys no parallel f-evals and
            # forces a replicate-then-repartition of every fiber array per
            # step. Run the callback chunk replicated instead.
            _fused_sharding = None
            if not suppress_warnings:
                logger.warning(
                    "cross(mesh=...) with a host-callback function: the "
                    "fiber evaluations run on one host device (callbacks "
                    "cannot be sharded); dropping the fiber sharding for "
                    "the fused path."
                )
        if _fused_sharding is not None:
            # Replicate the inputs over the mesh so the chunk program runs
            # SPMD; the fiber constraints inside spread f's work over devices
            _repl = NamedSharding(mesh, PartitionSpec())
            tcores = tuple(
                tuple(jax.device_put(c, _repl) for c in cs) for cs in tcores
            )
            Xs_val_mat = jax.device_put(Xs_val_mat, _repl)
        # The tensor dtype is part of the key: the callback wrapper bakes
        # its host-side output dtype at wrap time, so a cached chunk traced
        # for f32 tensors must not be reused when the same user function is
        # crossed again with f64 tensors (jit would otherwise feed the old
        # float32-casting callback into a program declaring float64 outputs).
        _fused_chunk_jit = _get_fused_chunk(
            f,
            cache_key=(id(function), function_arg, bool(detach_evaluations),
                       _callback, str(np.dtype(dtype))),
            fiber_sharding=_fused_sharding,
        )

        def _host_rcols():
            return tuple(
                jnp.asarray(np.asarray(rsets[j])[:, : N - 1 - j], dtype=jnp.int32)
                for j in range(N - 1)
            )
    elif not _host_mode:
        t_linterfaces, t_rinterfaces = init_interfaces(tensors, rsets, N)

    def evaluate_function(j):
        """Evaluate f on the Rs[j] x Rs[j+1] fibers of size Is[j] (device einsum)."""
        Xs = [
            _fibers(t_linterfaces[k][j], t.cores[j], t_rinterfaces[k][j])
            for k, t in enumerate(tensors)
        ]
        if _fiber_sharding is not None and Xs[0].shape[0] % _n_shards == 0:
            # Fiber-parallel: spread the independent sample points over devices
            Xs = [jax.device_put(x, _fiber_sharding) for x in Xs]

        eval_start = time.time()
        evaluation = f(*Xs)
        if record_samples:
            _rec.append((Xs, evaluation))  # device arrays; materialized once at the end
        info["eval_time"] += time.time() - eval_start
        if evaluation.ndim == 2:
            evaluation = evaluation[:, 0]
        if _minimize and not record_samples:
            # Device-resident minimize: atan transform + best/argmin tracking
            # carried as device scalars — zero host syncs per step (the
            # reference syncs every step, cross.py:342-359). The NaN guard
            # is deferred to the per-iteration sync; the step's fibers are
            # stashed so a failure can still name the offending point.
            evaluation, _mz["best"], _mz["has"], _mz["arg"] = _minimize_step(
                evaluation, _mz["best"], _mz["has"], _mz["arg"],
                jnp.asarray(lsets[j]), jnp.asarray(rsets[j]),
            )
            finite_flags.append(jnp.isfinite(evaluation).all())
            iter_samples.append((Xs, evaluation))
        elif _minimize:
            # minimize+record_samples keeps the host path (its pivoting is
            # host rect_maxvol anyway): Oseledets' atan transform, minimum
            # tracked from fiber coordinates (ttpy; reference cross.py:342-359)
            evaluation = np.pi / 2 - jnp.arctan(evaluation - info["min"])
            evaluation_argmax = int(jnp.argmax(evaluation))
            eval_min = float(jnp.tan(np.pi / 2 - evaluation[evaluation_argmax])) + info["min"]
            if info["min"] == 0 or eval_min < info["min"]:
                coords = np.unravel_index(evaluation_argmax, [Rs[j], Is[j], Rs[j + 1]])
                info["min"] = eval_min
                info["argmin"] = (
                    tuple(np.asarray(lsets[j])[coords[0]][1:])
                    + tuple([coords[1]])
                    + tuple(np.asarray(rsets[j])[coords[2]][:-1])
                )

        if record_samples and _minimize:
            # Immediate detailed NaN/Inf check (this path syncs anyway for
            # the host atan transform + rect_maxvol pivoting)
            bad = ~np.isfinite(np.asarray(evaluation))
            if bad.any():
                invalid = int(np.nonzero(bad)[0][0])
                raise ValueError(
                    "Invalid return value for function {}: f({}) = {}".format(
                        function,
                        ", ".join("{:g}".format(float(x[invalid])) for x in Xs),
                        float(np.asarray(evaluation)[invalid]),
                    )
                )
        elif record_samples:
            # Deferred guard like the normal path; the _rec stash doubles
            # as the lookup for a detailed message on failure
            finite_flags.append(jnp.isfinite(evaluation).all())
            iter_samples.append((Xs, evaluation))
        elif not _minimize:
            # Deferred guard: checked once per iteration with the validation
            # sync, so the sweep itself needs zero host round trips
            finite_flags.append(jnp.isfinite(evaluation).all())

        V = evaluation.reshape(Rs[j], Is[j], Rs[j + 1])
        info["nsamples"] += V.size
        return V

    val_eps = np.inf
    left_locals = []
    finite_flags = []
    iter_samples: list = []  # (Xs, evaluation) stash for NaN diagnosis
    # record_samples: per-step (Xs, raw evaluation) DEVICE arrays, gathered
    # to host once at the end — recording costs zero extra syncs per step
    # (VERDICT r2 weak #5: the old path np.concatenate'd every step)
    _rec: list = []
    lsets[0] = jnp.zeros((1, 1), dtype=jnp.int32)
    # Device-carried minimize state: running best, has-a-best flag, argmin
    # coordinate vector (length N; filled per step by _minimize_step)
    _mz = {
        "best": jnp.zeros((), dtype=dtype),
        "has": jnp.zeros((), dtype=bool),
        "arg": jnp.zeros((N,), dtype=jnp.int32),
    }

    # Module-level _grow_schedule/_draw_extra, bound to this run's params
    # (shared with the batched-minimize path — see their docstrings)
    _grow_schedule_local = functools.partial(
        _grow_schedule, Is=Is, rmax=rmax, kickrank=kickrank
    )
    _draw_extra_local = functools.partial(_draw_extra, rng, Is)

    if _host_mode:
        # NumPy host sweep (see cross_host.py and the branch comment above).
        # The matrix wrapper is rebuilt against NumPy (the jnp one would pull
        # every evaluation back onto a device); detach_evaluations is moot —
        # no gradients flow through host NumPy.
        if mesh is not None and not suppress_warnings:
            logger.warning(
                "cross(mesh=...) with a host-locked function on a backend "
                "without host callbacks: the sweep runs on the host "
                "(NumPy); the fiber sharding request is dropped."
            )
        from tntorch_tpu.cross_host import download_cores, host_sweep

        if function_arg == "matrix":
            def f_host(*args):
                return function(np.stack(args, axis=1))
        else:
            f_host = function
        tensors_np = download_cores(tensors)
        (cores, lsets, rsets, left_locals, Rs, val_eps, converged) = host_sweep(
            f_host, tensors_np, Is, Rs, lsets, rsets,
            np.stack(Xs_val, axis=1), kickrank, rmax, eps, max_iter,
            verbose, record_samples, info, function,
            _grow_schedule_local, _draw_extra_local, start,
        )

    if fused:

        def _nsamples(Rcur):
            return int(
                sum(Rcur[j] * Is[j] * Rcur[j + 1] for j in range(N - 1))
                + sum(Rcur[j] * Is[j] * Rcur[j + 1] for j in range(1, N))
                + Rcur[0] * Is[0] * Rcur[1]
            )

        rints_dev = None
        rcols_dev = _host_rcols()
        ys_dev = None  # validation targets: computed by the first chunk, carried after
        # Minimize state carried ACROSS chunks (best, has_best, argbest);
        # None disables the transform inside the chunk program
        mz_state = (
            (_mz["best"], _mz["has"], _mz["arg"]) if _minimize else None
        )
        i = 0
        while i < max_iter and not converged:
            # Speculative chunk: run S iterations (with on-device kickrank
            # growth between them) as one program, then check convergence
            # once — the tunnel round trip is paid per CHUNK, not per
            # iteration. First chunk is 4 deep (eps runs typically take >=4
            # sweeps, so nothing is wasted), later chunks 2.
            S = min(_CHUNK_DEPTH_FIRST if i == 0 else _CHUNK_DEPTH_NEXT, max_iter - i)
            schedule, extras_chunk = _stage_chunk(Rs, Is, S, rng, rmax, kickrank)
            it_start = time.time()
            args = (tcores, rcols_dev, rints_dev, tuple(extras_chunk), Xs_val_mat,
                    mz_state, ys_dev)
            sig = _arg_sig(id(_fused_chunk_jit), args)
            first_compile = sig not in _fused_seen_sigs
            with tn.utils.trace_annotation("tn.cross:fused_chunk"):
                (outs, stats_dev, packed_rsets, rints_next, mz_stack,
                 ys_dev) = _fused_chunk_jit(*args)
            # ONE host round trip per chunk (each fetched array costs a full
            # tunnel round trip, so eps + finite flags ride ONE packed array;
            # the final rsets are fetched only if the loop continues)
            stats = np.asarray(stats_dev)
            epss, finites = stats[:S], stats[S:] > 0.5
            # A chunk signature seen for the first time pays the XLA
            # trace+compile (tens of seconds through a TPU tunnel); booking
            # that into eval_time would make the reported evals/s garbage
            if first_compile:
                _fused_seen_sigs.add(sig)
                info["compile_time"] += time.time() - it_start
            else:
                info["eval_time"] += time.time() - it_start
            sel = S - 1
            for s in range(S):
                if not bool(finites[s]):
                    raise ValueError(
                        "Invalid return value (NaN/Inf) from function {} during "
                        "cross-approximation".format(function)
                    )
                val_eps = float(epss[s])
                info["val_epss"].append(val_eps)
                info["nsamples"] += _nsamples(schedule[s])
                if val_eps < eps:
                    converged = True
                if verbose:
                    print(
                        "iter: {: <{}}".format(i + s, len("{}".format(max_iter)) + 1),
                        end="",
                    )
                    if _minimize and mz_stack is not None:
                        best_s = (
                            float(mz_stack[0][s])
                            if bool(mz_stack[1][s])
                            else info["min"]
                        )
                        print("| best: {:.8g}".format(best_s), end="")
                    else:
                        print("| eps: {:.3e}".format(val_eps), end="")
                    print(
                        " | time: {:8.4f} | largest rank: {:3d}".format(
                            time.time() - start, int(max(schedule[s]))
                        ),
                        end="",
                    )
                    if converged:
                        print(" <- converged: eps < {}".format(eps))
                    elif i + s == max_iter - 1:
                        print(" <- max_iter was reached: {}".format(max_iter))
                    else:
                        print()
                    sys.stdout.flush()
                if converged:
                    sel = s
                    break
            cores = list(outs[sel][0])
            lsets = list(outs[sel][1])
            rsets = list(outs[sel][2])
            left_locals = list(outs[sel][3])
            Rs = schedule[sel]
            if _minimize and mz_stack is not None:
                # State AT the selected iteration (cumulative, so it equals
                # the eager path's state after i+sel+1 iterations)
                if bool(mz_stack[1][sel]):
                    info["min"] = float(mz_stack[0][sel])
                    info["argmin"] = tuple(
                        int(x) for x in np.asarray(mz_stack[2][sel])
                    )
                mz_state = (mz_stack[0][sel], mz_stack[1][sel], mz_stack[2][sel])
            i += sel + 1
            if converged or i >= max_iter:
                break
            # Unpack the final iteration's rsets (one additional transfer,
            # paid only when another chunk follows)
            packed = np.asarray(packed_rsets)
            rsets, off = [], 0
            for n in range(N - 1):
                R = int(schedule[-1][n + 1])
                rsets.append(packed[off:off + R, : N - n].astype(np.int64))
                off += R
            rsets.append(np.array([[0]]))
            if kickrank is not None:  # grow ranks between chunks
                newRs = _grow_schedule_local(Rs)
                extra = _draw_extra_local(newRs)
                for n in range(N - 1):
                    if newRs[n + 1] > Rs[n + 1]:
                        rsets[n] = np.vstack(
                            [rsets[n], extra[: newRs[n + 1] - Rs[n + 1], n:]]
                        )
                Rs = newRs
                rints_dev = None
                rcols_dev = _host_rcols()
            elif _minimize:
                # Minimize always stages index columns: the chunk rebuilds
                # the incoming rset ROWS from them for the atan transform
                rints_dev = None
                rcols_dev = _host_rcols()
            else:
                rints_dev = rints_next
                rcols_dev = None

    for i in range(0 if (fused or _host_mode) else max_iter):
        if verbose:
            print("iter: {: <{}}".format(i, len("{}".format(max_iter)) + 1), end="")
            sys.stdout.flush()

        left_locals = []

        # Left-to-right
        for j in range(N - 1):
            V = evaluate_function(j)
            Q = _qr_q(V.reshape(-1, Rs[j + 1]))  # left unfolding
            if _minimize and record_samples:
                # Host pivoting on the record_samples slow path only. The
                # reference's rect_maxvol(Q, maxK=Q.shape[1]) adds no rows
                # beyond the square pivots (K starts at maxK), i.e. it IS
                # square maxvol at start_maxvol_iters=10 (maxvol.py:30-111).
                local, _ = _rect_maxvol(np.asarray(Q), maxK=Q.shape[1])
                lj = jnp.asarray(local)
                local_r, local_i = np.unravel_index(local, [Rs[j], Is[j]])
                lsets[j + 1] = np.c_[np.asarray(lsets[j])[local_r, :], local_i]
                lr, li = jnp.asarray(local_r), jnp.asarray(local_i)
            elif Q.shape[0] <= Q.shape[1]:
                lj = jnp.arange(Q.shape[0], dtype=jnp.int32)
                lr, li = lj // Is[j], lj % Is[j]
                lsets[j + 1] = jnp.concatenate(
                    [lsets[j][lr], li[:, None].astype(jnp.int32)], axis=1
                )
            else:
                # Fully on-device pivoting: zero host round trips per step.
                # Minimize mode mirrors the reference's rect_maxvol call
                # (start_maxvol_iters=10; no rows are added at maxK=r, so
                # it IS square maxvol at 10 iterations)
                lj, _ = _maxvol_dev(Q, 1.05, 10 if _minimize else 100)
                lr, li = lj // Is[j], lj % Is[j]
                lsets[j + 1] = jnp.concatenate(
                    [jnp.asarray(lsets[j])[lr], li[:, None].astype(jnp.int32)], axis=1
                )
            # Interpolation: rows `local` become the identity
            cores[j] = _interp(Q, lj).reshape(Rs[j], Is[j], Rs[j + 1])
            left_locals.append(lj)
            for k, t in enumerate(tensors):
                t_linterfaces[k][j + 1] = _lint_update(
                    t_linterfaces[k][j], t.cores[j], lr, li
                )

        # Right-to-left
        for j in range(N - 1, 0, -1):
            V = evaluate_function(j)
            Q = _qr_q(V.reshape(Rs[j], -1).T)  # right unfolding, transposed
            if _minimize and record_samples:
                local, _ = _rect_maxvol(np.asarray(Q), maxK=Q.shape[1])
                lj = jnp.asarray(local)
                local_i, local_r = np.unravel_index(local, [Is[j], Rs[j + 1]])
                rsets[j - 1] = np.c_[local_i, np.asarray(rsets[j])[local_r, :]]
                li, lr = jnp.asarray(local_i), jnp.asarray(local_r)
            elif Q.shape[0] <= Q.shape[1]:
                lj = jnp.arange(Q.shape[0], dtype=jnp.int32)
                li, lr = lj // Rs[j + 1], lj % Rs[j + 1]
                rsets[j - 1] = jnp.concatenate(
                    [li[:, None].astype(jnp.int32), jnp.asarray(rsets[j])[lr]], axis=1
                )
            else:
                lj, _ = _maxvol_dev(Q, 1.05, 10 if _minimize else 100)
                li, lr = lj // Rs[j + 1], lj % Rs[j + 1]
                rsets[j - 1] = jnp.concatenate(
                    [li[:, None].astype(jnp.int32), jnp.asarray(rsets[j])[lr]], axis=1
                )
            cores[j] = _interp(Q, lj).T.reshape(Rs[j], Is[j], Rs[j + 1])
            for k, t in enumerate(tensors):
                t_rinterfaces[k][j - 1] = _rint_update(
                    t.cores[j], t_rinterfaces[k][j], li, lr
                )

        # Leave the first core ready
        V = evaluate_function(0)
        cores[0] = V

        # Validation error (jitted TT evaluation at the validation coordinates)
        pred = _val_forward(list(cores), Xs_val_mat)
        val_eps = float(jnp.linalg.norm(ys_val - pred) / norm_ys_val)
        if finite_flags:
            if not bool(jnp.stack(finite_flags).all()):
                # Locate the first bad point for a detailed message (the
                # per-iteration stash exists on the minimize path)
                for Xs_s, ev_s in iter_samples:
                    bad = ~np.isfinite(np.asarray(ev_s))
                    if bad.any():
                        invalid = int(np.nonzero(bad)[0][0])
                        raise ValueError(
                            "Invalid return value for function {}: f({}) = {}".format(
                                function,
                                ", ".join(
                                    "{:g}".format(float(x[invalid])) for x in Xs_s
                                ),
                                float(np.asarray(ev_s)[invalid]),
                            )
                        )
                raise ValueError(
                    "Invalid return value (NaN/Inf) from function {} during "
                    "cross-approximation".format(function)
                )
            finite_flags.clear()
        iter_samples.clear()
        if record_samples:
            # Drain this iteration's stash to host now that the val_eps
            # float() above has synced anyway: bounds the device-memory
            # footprint to one iteration of samples at zero extra syncs
            for k in range(len(_rec)):
                Xs_s, ev_s = _rec[k]
                if not isinstance(ev_s, np.ndarray):
                    _rec[k] = ([np.asarray(x) for x in Xs_s], np.asarray(ev_s))
        if _minimize and not record_samples and bool(_mz["has"]):
            info["min"] = float(_mz["best"])
            info["argmin"] = tuple(int(x) for x in np.asarray(_mz["arg"]))
        info["val_epss"].append(val_eps)
        if val_eps < eps:
            converged = True
        if verbose:
            if _minimize:
                print("| best: {:.8g}".format(info["min"]), end="")
            else:
                print("| eps: {:.3e}".format(val_eps), end="")
            print(
                " | time: {:8.4f} | largest rank: {:3d}".format(time.time() - start, max(Rs)),
                end="",
            )
            if converged:
                print(" <- converged: eps < {}".format(eps))
            elif i == max_iter - 1:
                print(" <- max_iter was reached: {}".format(max_iter))
            else:
                print()
        if converged:
            break
        elif i < max_iter - 1 and kickrank is not None:  # grow ranks
            newRs = _grow_schedule_local(Rs)
            extra = _draw_extra_local(newRs)
            for n in range(N - 1):
                if newRs[n + 1] > Rs[n + 1]:
                    rsets[n] = np.vstack([rsets[n], extra[: newRs[n + 1] - Rs[n + 1], n:]])
            Rs = newRs
            t_linterfaces, t_rinterfaces = init_interfaces(tensors, rsets, N)

    if val_eps > eps and not _minimize and not suppress_warnings:
        logger.warning(
            "eps={:g} (larger than {}) when cross-approximating {}".format(val_eps, eps, function)
        )

    if verbose:
        # evals/s from eval_time alone when any warm chunk ran; a run that
        # never escaped first-compiles has no meaningful throughput sample
        denom = info["eval_time"] if info["eval_time"] > 0 else (
            info["eval_time"] + info["compile_time"]
        )
        print(
            "Did {} function evaluations, which took {:.4g}s{} ({:.4g} evals/s)".format(
                info["nsamples"], info["eval_time"],
                " (+{:.4g}s compile)".format(info["compile_time"])
                if info["compile_time"] > 0 else "",
                info["nsamples"] / max(denom, 1e-12),
            )
        )
        print()

    if record_samples and _rec:
        info["sample_positions"] = np.concatenate(
            [np.stack([np.asarray(x) for x in Xs_s], axis=1) for Xs_s, _ in _rec],
            axis=0,
        )
        info["sample_values"] = np.concatenate(
            [np.asarray(ev).reshape(-1) for _, ev in _rec]
        )

    if _host_pin:
        # The host-pinned eager run leaves cores committed on the CPU
        # device; hand back uncommitted default-device arrays
        cores = [jax.device_put(np.asarray(c)) for c in cores]
    elif _host_mode:
        # One concatenated transfer instead of N device_puts (each pays a
        # tunnel round trip; the result cores total ~30 MB at bench sizes)
        from tntorch_tpu.cross_host import upload_cores

        cores = upload_cores(cores)
    ret = tn.Tensor(list(cores))
    if return_info:
        info["lsets"] = lsets
        info["rsets"] = rsets
        info["Rs"] = Rs
        info["left_locals"] = left_locals
        info["total_time"] = time.time() - start
        info["val_eps"] = val_eps
        return ret, info
    return ret


def cross_forward(
    info,
    function=lambda x: x,
    domain=None,
    tensors=None,
    function_arg: str = "vectors",
    return_info: bool = False,
):
    """Differentiable TT-cross re-interpolation from recorded pivot sets
    (reference cross.py:532-644): replays `lsets`/`rsets`/`left_locals` with
    fresh function evaluations — no maxvol, so gradients flow through."""
    assert domain is not None or tensors is not None
    assert function_arg in ("vectors", "matrix")
    if function_arg == "matrix":
        def f(*args):
            return function(jnp.concatenate([arg[:, None] for arg in args], axis=1))
    else:
        f = function
    if tensors is None:
        tensors = tn.meshgrid(domain)
    if not hasattr(tensors, "__len__"):
        tensors = [tensors]

    Is = list(tensors[0].shape)
    N = len(Is)

    lsets = [np.asarray(l) for l in info["lsets"]]
    rsets = [np.asarray(r) for r in info["rsets"]]
    left_locals = info["left_locals"]
    Rs = info["Rs"]

    if return_info:
        info["Xs"] = np.zeros((0, N))
        info["shapes"] = []

    t_linterfaces, t_rinterfaces = init_interfaces(tensors, rsets, N)

    def evaluate_function(j):
        Xs = []
        for k, t in enumerate(tensors):
            V = jnp.einsum(
                "ai,ibj,jc->abc", t_linterfaces[k][j], tensors[k].cores[j], t_rinterfaces[k][j]
            )
            Xs.append(V.reshape(-1))
        evaluation = f(*Xs)
        if return_info:
            info["Xs"] = np.concatenate(
                (info["Xs"], np.stack([np.asarray(jax.lax.stop_gradient(x)) for x in Xs], axis=1)),
                axis=0,
            )
            info["shapes"].append([Rs[j], Is[j], Rs[j + 1]])
        return evaluation.reshape(Rs[j], Is[j], Rs[j + 1])

    cores = []
    for j in range(0, N - 1):
        V = evaluate_function(j)
        V = V.reshape(-1, V.shape[2])
        A = V[left_locals[j], :]
        # Least-squares (not solve): recorded pivot rows may be singular on
        # the fresh evaluations (reference uses lstsq, cross.py:624)
        X = jnp.linalg.lstsq(A.T, V.T)[0].T
        cores.append(X.reshape(Rs[j], Is[j], Rs[j + 1]))

        local_r, local_i = np.unravel_index(left_locals[j], [Rs[j], Is[j]])
        lsets[j + 1] = np.c_[lsets[j][local_r, :], local_i]
        for k, t in enumerate(tensors):
            t_linterfaces[k][j + 1] = jnp.einsum(
                "ai,iaj->aj", t_linterfaces[k][j][local_r, :], t.cores[j][:, local_i, :]
            )

    cores.append(evaluate_function(N - 1))
    if return_info:
        return tn.Tensor(cores), info
    return tn.Tensor(cores)
