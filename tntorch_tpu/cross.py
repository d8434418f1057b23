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

import logging
import sys
import time
from typing import Any, Callable, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

import tntorch_tpu as tn
from tntorch_tpu.maxvol import maxvol_device as _maxvol_dev
from tntorch_tpu.maxvol import rect_maxvol as _rect_maxvol


def minimum(tensors=None, function=lambda x: x, rmax=10, max_iter=10, verbose=False, **kwargs):
    """Estimate the minimum of a tensor / function of tensors (reference cross.py:12-37)."""
    _, info = cross(
        **kwargs, tensors=tensors, function=function, rmax=rmax, max_iter=max_iter,
        verbose=verbose, return_info=True, _minimize=True,
    )
    return info["min"]


def argmin(tensors=None, function=lambda x: x, rmax=10, max_iter=10, verbose=False, **kwargs):
    _, info = cross(
        **kwargs, tensors=tensors, function=function, rmax=rmax, max_iter=max_iter,
        verbose=verbose, return_info=True, _minimize=True,
    )
    return info["argmin"]


def maximum(tensors=None, function=lambda x: x, rmax=10, max_iter=10, verbose=False, **kwargs):
    _, info = cross(
        **kwargs, function=lambda *x: -function(*x), tensors=tensors, rmax=rmax,
        max_iter=max_iter, verbose=verbose, return_info=True, _minimize=True,
    )
    return -info["min"]


def argmax(tensors=None, function=lambda x: x, rmax=10, max_iter=10, verbose=False, **kwargs):
    _, info = cross(
        **kwargs, tensors=tensors, function=lambda *x: -function(*x), rmax=rmax,
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
):
    """Sample a black-box function on fibers chosen by maxvol pivoting and
    return an N-dimensional TT approximation (reference cross.py:138-529).

    Accepts either a `domain` (list of N grid vectors) with a function
    R^N -> R, or a list of K equal-shaped tensors with a function R^K -> R.

    :param mesh: optional jax.sharding.Mesh — the per-step fiber evaluations
        (embarrassingly parallel across the Rs[j] x I x Rs[j+1] sample points,
        SURVEY.md section 2c) are sharded over the mesh's first axis before
        calling `function`.
    """
    rng = np.random.default_rng(seed)

    assert domain is not None or tensors is not None
    assert function_arg in ("vectors", "matrix")
    if function_arg == "matrix":
        def f(*args):
            return function(jnp.concatenate([arg[:, None] for arg in args], axis=1))
    else:
        f = function

    if detach_evaluations:
        def build_function_wrapper(func):
            def g(*args):
                res = func(*args)
                return jax.lax.stop_gradient(res)
            return g
        f = build_function_wrapper(f)

    if tensors is None:
        tensors = tn.meshgrid(domain)
    if not hasattr(tensors, "__len__"):
        tensors = [tensors]
    for t in tensors:
        if t.batch:
            raise ValueError("Batched tensors are not supported.")
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
    cores = [
        jnp.asarray(rng.standard_normal((Rs[n], Is[n], Rs[n + 1])), dtype=dtype)
        for n in range(N)
    ]

    # Left and right index sets
    lsets = [np.array([[0]])] + [None] * (N - 1)
    randint = np.hstack(
        [rng.integers(0, Is[n + 1], [max(Rs), 1]) for n in range(N - 1)]
        + [np.zeros([max(Rs), 1], dtype=int)]
    )
    rsets = [randint[: Rs[n + 1], n:] for n in range(N - 1)] + [np.array([[0]])]

    t_linterfaces, t_rinterfaces = init_interfaces(tensors, rsets, N)

    # Validation set
    Xs_val = [np.asarray(rng.choice(I, int(val_size))) for I in Is]
    Xs_val_mat = jnp.asarray(np.stack(Xs_val, axis=1))
    ys_val = f(*[t[Xs_val].full() for t in tensors])
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

    info = {"nsamples": 0, "eval_time": 0, "val_epss": [], "min": 0, "argmin": None}
    if record_samples:
        info["sample_positions"] = np.zeros((0, N))
        info["sample_values"] = np.zeros(0)

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        _fiber_sharding = NamedSharding(mesh, PartitionSpec(mesh.axis_names[0]))
        _n_shards = mesh.devices.shape[0]
    else:
        _fiber_sharding = None

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
            info["sample_positions"] = np.concatenate(
                (info["sample_positions"], np.stack([np.asarray(x) for x in Xs], axis=1)), axis=0
            )
            info["sample_values"] = np.concatenate(
                (info["sample_values"], np.asarray(evaluation).reshape(-1))
            )
        info["eval_time"] += time.time() - eval_start
        if _minimize:
            # Oseledets' atan transform for TT minimization (ttpy)
            evaluation = np.pi / 2 - jnp.arctan(evaluation - info["min"])
            evaluation_argmax = int(jnp.argmax(evaluation))
            eval_min = float(jnp.tan(np.pi / 2 - evaluation[evaluation_argmax])) + info["min"]
            if info["min"] == 0 or eval_min < info["min"]:
                coords = np.unravel_index(evaluation_argmax, [Rs[j], Is[j], Rs[j + 1]])
                info["min"] = eval_min
                info["argmin"] = (
                    tuple(lsets[j][coords[0]][1:])
                    + tuple([coords[1]])
                    + tuple(rsets[j][coords[2]][:-1])
                )

        if evaluation.ndim == 2:
            evaluation = evaluation[:, 0]
        if _minimize or record_samples:
            # Immediate detailed NaN/Inf check (these paths sync anyway)
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
        else:
            # Deferred guard: checked once per iteration with the validation
            # sync, so the sweep itself needs zero host round trips
            finite_flags.append(jnp.isfinite(evaluation).all())

        V = evaluation.reshape(Rs[j], Is[j], Rs[j + 1])
        info["nsamples"] += V.size
        return V

    val_eps = np.inf
    left_locals = []
    finite_flags = []
    if not _minimize:
        lsets[0] = jnp.zeros((1, 1), dtype=jnp.int32)
    for i in range(max_iter):
        if verbose:
            print("iter: {: <{}}".format(i, len("{}".format(max_iter)) + 1), end="")
            sys.stdout.flush()

        left_locals = []

        # Left-to-right
        for j in range(N - 1):
            V = evaluate_function(j)
            Q = _qr_q(V.reshape(-1, Rs[j + 1]))  # left unfolding
            if _minimize:
                local, _ = _rect_maxvol(np.asarray(Q), maxK=Q.shape[1])
                lj = jnp.asarray(local)
                local_r, local_i = np.unravel_index(local, [Rs[j], Is[j]])
                lsets[j + 1] = np.c_[lsets[j][local_r, :], local_i]
                lr, li = jnp.asarray(local_r), jnp.asarray(local_i)
            elif Q.shape[0] <= Q.shape[1]:
                lj = jnp.arange(Q.shape[0], dtype=jnp.int32)
                lr, li = lj // Is[j], lj % Is[j]
                lsets[j + 1] = jnp.concatenate(
                    [lsets[j][lr], li[:, None].astype(jnp.int32)], axis=1
                )
            else:
                # Fully on-device pivoting: zero host round trips per step
                lj, _ = _maxvol_dev(Q)
                lr, li = lj // Is[j], lj % Is[j]
                lsets[j + 1] = jnp.concatenate(
                    [lsets[j][lr], li[:, None].astype(jnp.int32)], axis=1
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
            if _minimize:
                local, _ = _rect_maxvol(np.asarray(Q), maxK=Q.shape[1])
                lj = jnp.asarray(local)
                local_i, local_r = np.unravel_index(local, [Is[j], Rs[j + 1]])
                rsets[j - 1] = np.c_[local_i, rsets[j][local_r, :]]
                li, lr = jnp.asarray(local_i), jnp.asarray(local_r)
            elif Q.shape[0] <= Q.shape[1]:
                lj = jnp.arange(Q.shape[0], dtype=jnp.int32)
                li, lr = lj // Rs[j + 1], lj % Rs[j + 1]
                rsets[j - 1] = jnp.concatenate(
                    [li[:, None].astype(jnp.int32), jnp.asarray(rsets[j])[lr]], axis=1
                )
            else:
                lj, _ = _maxvol_dev(Q)
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
        from tntorch_tpu.parallel.mesh import tt_batch_forward

        pred = jax.jit(tt_batch_forward)(list(cores), Xs_val_mat)
        val_eps = float(jnp.linalg.norm(ys_val - pred) / norm_ys_val)
        if finite_flags:
            if not bool(jnp.stack(finite_flags).all()):
                raise ValueError(
                    "Invalid return value (NaN/Inf) from function {} during "
                    "cross-approximation".format(function)
                )
            finite_flags.clear()
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
            newRs = Rs.copy()
            newRs[1:-1] = np.minimum(rmax, newRs[1:-1] + kickrank)
            for n in list(range(1, N)) + list(range(N - 1, 0, -1)):
                newRs[n] = min(newRs[n - 1] * Is[n - 1], newRs[n], Is[n] * newRs[n + 1])
            extra = np.hstack(
                [rng.integers(0, Is[n + 1], [max(newRs), 1]) for n in range(N - 1)]
                + [np.zeros([max(newRs), 1], dtype=int)]
            )
            for n in range(N - 1):
                if newRs[n + 1] > Rs[n + 1]:
                    rsets[n] = np.vstack([rsets[n], extra[: newRs[n + 1] - Rs[n + 1], n:]])
            Rs = newRs
            t_linterfaces, t_rinterfaces = init_interfaces(tensors, rsets, N)

    if val_eps > eps and not _minimize and not suppress_warnings:
        logging.warning(
            "eps={:g} (larger than {}) when cross-approximating {}".format(val_eps, eps, function)
        )

    if verbose:
        print(
            "Did {} function evaluations, which took {:.4g}s ({:.4g} evals/s)".format(
                info["nsamples"], info["eval_time"],
                info["nsamples"] / max(info["eval_time"], 1e-12),
            )
        )
        print()

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
