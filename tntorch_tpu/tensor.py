"""Core tensor-network container for the TPU-native tntorch rebuild.

Design (TPU-first, not a translation):

- `Tensor` is a registered JAX pytree: leaves are the TT/CP cores and the
  optional Tucker factors, so every tensor flows through `jit`/`vmap`/`grad`.
- Batch mode is *not* a forest of `if self.batch:` branches like the reference
  (cf. /root/reference/tntorch/tensor.py passim): JAX linalg (qr/svd/eigh) and
  einsum broadcast over leading batch dims natively, so one code path serves
  both layouts. Where the reference writes paired einsum strings
  ('ijk,aj->iak' / 'bijk,baj->biak') we write a single ellipsis contraction.
- All "in-place" methods rebind `self.cores[...]` to fresh immutable arrays;
  functional wrappers live in `round.py`.

Semantics match rballester/tntorch `tensor.py` (behavioral reference cited
per-method by file:line) at <=1e-6 relative error, with its latent defects
fixed (e.g. `__pow__`, tensor.py:789-795 references an undefined name).

Core kinds (reference tensor.py:107-117): an N-dim tensor holds N cores,
each being a TT core (R_{n-1} x I_n x R_n), a CP factor (I_n x R), or either
of those with a Tucker factor U_n (I_n x S_n) attached. `batch=True` adds a
leading batch axis B to every core/factor.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

import tntorch_tpu as tn
from tntorch_tpu.utils import asarray, take_mode, to_numpy
from tntorch_tpu.utils import policy_precision as _policy_precision


def _full_rank_tt(data: jax.Array) -> list:
    """Exact (uncompressed) TT representation of a dense tensor.

    Ranks are full: R_k = min(prod_{i<=k} I_i, prod_{i>k} I_i). Identity
    cores are placed on the short side and the data on the long side
    (behavioral reference: tensor.py:10-104).
    """
    shape = data.shape
    dtype = data.dtype
    N = data.ndim
    result = []
    resh = data.reshape(shape[0], -1)
    for n in range(1, N):
        L, R = resh.shape
        if L < R:
            result.append(jnp.eye(L, dtype=dtype).reshape(L // shape[n - 1], shape[n - 1], L))
            resh = resh.reshape(L * shape[n], R // shape[n])
        else:
            result.append(resh.reshape(L // shape[n - 1], shape[n - 1], R))
            resh = jnp.eye(R, dtype=dtype).reshape(R * shape[n], R // shape[n])
    result.append(resh.reshape(resh.shape[0] // shape[N - 1], shape[N - 1], 1))
    return result


def _full_rank_tt_batch(data: jax.Array) -> list:
    """Batched variant: vmap the exact TT construction over the leading axis."""
    return jax.vmap(_full_rank_tt)(data)


def _core_kron(a: jax.Array, b: jax.Array, batch: bool = False) -> jax.Array:
    """Slice-wise Kronecker product of two TT cores (reference tensor.py:2309-2319)."""
    if batch:
        c = a[:, :, None, :, :, None] * b[:, None, :, :, None, :]
        return c.reshape(a.shape[0], a.shape[1] * b.shape[1], -1, a.shape[-1] * b.shape[-1])
    c = a[:, None, :, :, None] * b[None, :, :, None, :]
    return c.reshape(a.shape[0] * b.shape[0], -1, a.shape[-1] * b.shape[-1])


def _broadcast(a: "Tensor", b: "Tensor"):
    """Repeat-based shape broadcasting for binary ops (reference tensor.py:2290-2306).

    For batch tensors, `shape` carries the leading batch size but `repeat`
    takes PER-MODE counts — the reference fed the full shape in, shifting
    every count by one; here the batch dim is excluded (batch sizes must
    already agree).

    Unlike the reference (which silently rounds non-divisible shape ratios,
    e.g. (2,) vs (3,) -> repeat 2 -> shape 4, surfacing later as an opaque
    core mismatch), non-integer-multiple mode sizes raise here."""
    if a.batch != b.batch:
        raise ValueError(
            "Cannot operate a batch tensor with a non-batch tensor; "
            "stack the non-batch operand into a batch (or index the batch one) first"
        )
    if tuple(a.shape) == tuple(b.shape):
        return a, b
    if a.dim() != b.dim():
        raise ValueError(
            "Cannot broadcast: lhs has {} dimensions, rhs has {}".format(a.dim(), b.dim())
        )
    off = 1 if a.batch else 0
    if off and a.shape[0] != b.shape[0]:
        raise ValueError(
            "Cannot broadcast batch sizes {} and {}".format(a.shape[0], b.shape[0])
        )
    sa, sb = a.shape[off:], b.shape[off:]
    ra, rb = [], []
    for n, (s1, s2) in enumerate(zip(sa, sb)):
        lo, hi = min(s1, s2), max(s1, s2)
        if hi % lo != 0:
            raise ValueError(
                "Cannot broadcast mode {}: sizes {} and {} are not integer "
                "multiples".format(n, s1, s2)
            )
        ra.append(s2 // s1 if s2 > s1 else 1)
        rb.append(s1 // s2 if s1 > s2 else 1)
    return a.repeat(*ra), b.repeat(*rb)


from functools import partial as _partial


_f32_gram_warned = False


def _warn_f32_gram_once():
    """One-time accuracy note for sub-f64 Gram rounding under performance
    policies: the ~1e-3 error floor on rank-deficient input must not be
    silent (it follows from squared conditioning, see PERF.md)."""
    global _f32_gram_warned
    if not _f32_gram_warned:
        _f32_gram_warned = True
        from tntorch_tpu.utils import logger

        logger.warning(
            "round_tt(algorithm='gram'/'randgram') on float32 cores: the "
            "Gram method squares the condition number, so rank-deficient "
            "input (e.g. rounding t+t) carries a ~1e-3 relative error "
            "floor. Use tn.set_policy('highest') (which routes 'gram' to "
            "the SVD sweep), algorithm='svd', or float64 cores when "
            "accuracy matters. This warning is shown once per process."
        )


def _cp_khatri_asc(cores, batch):
    """Khatri-Rao product of a list of CP factors, rows in C order (earlier
    modes slower) so they align with trailing/leading reshapes of the data."""
    R = cores[0].shape[-1]
    bshape = cores[0].shape[:1] if batch else ()
    k = cores[0]
    for c in cores[1:]:
        k = (k[..., :, None, :] * c[..., None, :, :]).reshape(bshape + (-1, R))
    return k


@_partial(jax.jit, static_argnames=("batch",))
def _cp_als_iter(data, cores, normsq_data, batch=False):
    """One CP-ALS sweep over all modes + relative-error check, jitted
    (reference tensor.py:323-379). Two departures from the reference's eager
    loop, both layout-driven: (1) the MTTKRP right-hand sides use the
    3-GEMM split  rhs_n = sum_l [reshape(data,(L*I_n,T)) @ KR]_{l,i,r} KL_{l,r}
    on the ORIGINAL data layout — no mode-n unfolding (permuted 16MB copy)
    is ever materialized; (2) the per-sweep error check uses the compressed
    identity ||data - X||^2 = ||data||^2 - 2<data,X> + ||X||^2 whose terms
    fall out of the final mode's normal equations for free, replacing the
    reference's O(I^N) dense reconstruction per iteration (its known defect,
    SURVEY.md section 7)."""
    N = len(cores)
    bdims = 1 if batch else 0
    bshape = data.shape[:1] if batch else ()
    shapes = data.shape[bdims:]
    R = cores[0].shape[-1]
    cores = list(cores)
    grams = [jnp.swapaxes(c, -1, -2) @ c for c in cores]
    ones = jnp.ones(grams[0].shape, dtype=data.dtype)
    rhs = prod = None
    for n in range(N):
        prod = ones
        for m in range(N):
            if m != n:
                prod = prod * grams[m]
        L = int(np.prod(shapes[:n], dtype=np.int64))
        if n == N - 1:
            # Trailing mode: rhs = unf^T @ KL as a transposed GEMM (no copy)
            M2 = data.reshape(bshape + (L, shapes[n]))
            KL = _cp_khatri_asc(cores[:n], batch)
            rhs = jnp.einsum("...li,...lr->...ir", M2, KL)
        else:
            KR = _cp_khatri_asc(cores[n + 1:], batch)  # (..., T, R)
            Y = (data.reshape(bshape + (L * shapes[n], -1)) @ KR).reshape(
                bshape + (L, shapes[n], R)
            )
            if n == 0:
                rhs = Y.reshape(bshape + (shapes[0], R))
            else:
                KL = _cp_khatri_asc(cores[:n], batch)
                rhs = jnp.sum(Y * KL[..., :, None, :], axis=-3)
        # Least-squares via pinv of the R x R normal matrix (tiny; batched)
        sol = jnp.linalg.pinv(prod) @ jnp.swapaxes(rhs, -1, -2)
        cores[n] = jnp.swapaxes(sol, -1, -2)
        grams[n] = jnp.swapaxes(cores[n], -1, -2) @ cores[n]

    # Compressed error: <data, X> = sum(rhs_last * core_last); ||X||^2 =
    # sum(prod_other * gram_last). Matches the dense check to roundoff.
    red = (-2, -1) if batch else None
    dot_dx = jnp.sum(rhs * cores[N - 1], axis=red)
    normsq_x = jnp.sum(prod * grams[N - 1], axis=red)
    relsq = jnp.clip(normsq_data - 2 * dot_dx + normsq_x, min=0) / normsq_data
    rel = jnp.mean(jnp.sqrt(relsq)) if batch else jnp.sqrt(relsq)
    return tuple(cores), rel


@_partial(jax.jit, static_argnames=("R", "batch"))
def _cp_hosvd_factors(data, R, batch=False):
    """Init factors for CP-ALS as one XLA program: SEQUENTIALLY truncated
    HOSVD (Vannieuwenhoven et al., SIAM JSC 2012). Mode n's factor comes
    from the Gram of the data already projected onto factors 0..n-1, so only
    mode 0 touches the full tensor — one syrk-shaped GEMM on the original
    layout (no permuted unfolding copies) — and every later Gram is on the
    R x ... projected core (negligible). Equal quality as an ALS initializer
    to the reference's plain HOSVD (tensor.py:217-277), which the first ALS
    sweep supersedes anyway; the eps trajectory may differ in late digits."""
    bdims = 1 if batch else 0
    N = data.ndim - bdims
    bshape = data.shape[:1] if batch else ()
    shapes = data.shape[bdims:]
    core = data.reshape(bshape + (1,) + tuple(shapes))
    factors = []
    for n in range(N):
        P = core.shape[bdims]
        I = shapes[n]
        M = core.reshape(bshape + (P, I, -1))
        gram = jnp.einsum("...pit,...pjt->...ij", M, M)
        _, eigvecs = jnp.linalg.eigh(gram)
        U = eigvecs[..., ::-1][..., : min(R, I)]  # (..., I, r)
        factors.append(U)
        if n < N - 1:
            core = jnp.einsum("...pit,...ir->...prt", M, U).reshape(
                bshape + (P * U.shape[-1],) + tuple(shapes[n + 1:])
            )
    return tuple(factors)


class Tensor:
    """Unified TT / CP / Tucker / hybrid tensor-network container (JAX pytree)."""

    def __init__(
        self,
        data: Any,
        Us: Optional[Sequence] = None,
        idxs: Optional[Sequence] = None,
        device: Optional[Any] = None,
        requires_grad: Optional[bool] = None,
        ranks_cp: Optional[int] = None,
        ranks_tucker: Optional[Union[int, Sequence[int]]] = None,
        ranks_tt: Optional[Union[int, Sequence[int]]] = None,
        eps: Optional[float] = None,
        max_iter: int = 25,
        tol: float = 1e-4,
        verbose: bool = False,
        batch: bool = False,
        algorithm: str = "svd",
        dtype: Optional[Any] = None,
    ):
        """Build from a list of cores, or decompose a dense array.

        Mirrors reference tensor.py:119-439: `ranks_tt`/`ranks_tucker` trigger
        TT-SVD / HOSVD-style rounding of the exact TT; `ranks_cp` runs CP-ALS;
        `eps` runs error-bounded TT+Tucker rounding.
        """
        self.batch = bool(batch)
        self.requires_grad = bool(requires_grad) if requires_grad is not None else False
        # Mode indices whose Tucker factor is fixed (not a trainable node) —
        # the reference expresses this as Us[m].requires_grad=False
        self.frozen_Us = set()

        if isinstance(data, (list, tuple)):
            mn = 3 if batch else 2  # CP core ndim
            mx = mn + 1  # TT core ndim
            data = [asarray(d) for d in data]
            if device is not None:
                # Honor device= for core lists too (reference tensor.py:195-202)
                data = [jax.device_put(d, device) for d in data]
            if not all(mn <= d.ndim <= mx for d in data):
                raise ValueError(
                    "All tensor cores must have 2 (for CP) or 3 (for TT) dimensions"
                )
            d1, d2 = (1, 2) if batch else (0, 1)
            for n in range(len(data) - 1):
                if (
                    data[n + 1].ndim == mx and data[n].shape[-1] != data[n + 1].shape[d1]
                ) or (
                    data[n + 1].ndim == mn and data[n].shape[-1] != data[n + 1].shape[d2]
                ):
                    raise ValueError("Core ranks do not match")
            self.cores = list(data)
            N = len(data)
        else:
            data = asarray(data, dtype=dtype)
            if device is not None:
                data = jax.device_put(data, device)
            if data.ndim == 0:
                data = data[None]
            N = data.ndim - (1 if batch else 0)

        if Us is None:
            Us = [None] * (N if isinstance(data, jax.Array) else len(self.cores))
        self.Us = [None if U is None else asarray(U) for U in Us]

        if isinstance(data, jax.Array):
            if ranks_cp is not None:
                if ranks_tt is not None:
                    raise ValueError("ALS for CP-TT is not yet supported")
                assert not hasattr(ranks_cp, "__len__")
                self._init_cp_als(
                    data, ranks_cp, ranks_tucker, max_iter, tol, verbose, algorithm
                )
            elif (
                ranks_tt is not None
                and ranks_tucker is None
                and algorithm in ("gram", "randomized")
            ):
                # Direct jitted TT-SVD kernels (see ops/decomposition.py):
                # fixed target ranks -> static shapes -> one XLA program
                from tntorch_tpu.ops.decomposition import (
                    _cap_ranks, _tt_svd_gram, tt_svd_randomized,
                )

                if batch:
                    ranks = _cap_ranks(data.shape[1:], ranks_tt)
                    self.cores = list(
                        jax.vmap(lambda d: tuple(_tt_svd_gram(d, ranks)))(data)
                    )
                elif algorithm == "randomized":
                    self.cores = tt_svd_randomized(data, ranks_tt)
                else:
                    self.cores = list(
                        _tt_svd_gram(data, _cap_ranks(data.shape, ranks_tt))
                    )
                self.Us = [None] * self.dim()
            else:
                self.cores = (
                    _full_rank_tt_batch(data) if batch else _full_rank_tt(data)
                )
                self.Us = [None] * self.dim()
                if ranks_tucker is not None:
                    # round_tucker knows 'svd'/'eig' only; the TT-stage-only
                    # algorithms map to their accuracy class ('gram' and
                    # 'randomized' are Gram/eigh-based)
                    tucker_algorithm = (
                        "eig" if algorithm in ("gram", "randomized") else algorithm
                    )
                    self.round_tucker(rmax=ranks_tucker, algorithm=tucker_algorithm)
                if ranks_tt is not None:
                    self.round_tt(rmax=ranks_tt, algorithm=algorithm)

        # Validate Tucker factor shapes (reference tensor.py:410-424)
        fd = 3 if batch else 2
        for n in range(self.dim()):
            if self.Us[n] is None:
                continue
            assert self.Us[n].ndim == fd
            assert self.cores[n].shape[-2] == self.Us[n].shape[-1]

        if idxs is None:
            idxs = [np.arange(sh) for sh in self.shape[1 if batch else 0:]]
            if batch:
                idxs = [np.arange(self.shape[0])] + idxs
        self.idxs = [to_numpy(i) if i is not None else None for i in idxs]

        if eps is not None:
            if ranks_cp is not None or ranks_tucker is not None or ranks_tt is not None:
                raise ValueError("Specify eps or ranks, but not both")
            self.round(eps, algorithm=algorithm)

    # ------------------------------------------------------------------
    # CP-ALS decomposition of a dense tensor (reference tensor.py:210-400)
    # ------------------------------------------------------------------
    @_policy_precision
    def _init_cp_als(self, data, ranks_cp, ranks_tucker, max_iter, tol, verbose, algorithm):
        batch = self.batch
        bdims = 1 if batch else 0
        N = data.ndim - bdims
        dtype = data.dtype

        if ranks_tucker is None:
            # ST-HOSVD init, all modes in one jitted program (random pad
            # only if R > I)
            self.cores = []
            for core in _cp_hosvd_factors(data, int(ranks_cp), batch):
                if core.shape[-1] < ranks_cp:
                    pad = jax.random.normal(
                        tn.utils.next_key(),
                        core.shape[:-1] + (ranks_cp - core.shape[-1],),
                        dtype=dtype,
                    )
                    core = jnp.concatenate([core, pad], axis=-1)
                self.cores.append(core)
        else:
            # CP on the Tucker core (reference tensor.py:278-302)
            self.cores = _full_rank_tt_batch(data) if batch else _full_rank_tt(data)
            self.Us = [None] * N
            self.round_tucker(rmax=ranks_tucker, algorithm=algorithm)
            data = self.tucker_core()
            shp = data.shape[bdims:]
            self.cores = [
                jax.random.normal(
                    tn.utils.next_key(),
                    ((data.shape[0],) if batch else ()) + (sh, ranks_cp),
                    dtype=dtype,
                )
                for sh in shp
            ]

        errors = []
        cores = tuple(self.cores)
        sum_axes = tuple(range(1, data.ndim)) if batch else None
        normsq_data = jnp.sum(data * data, axis=sum_axes)
        for it in range(max_iter):
            # One full ALS sweep + error check as a single jitted XLA program
            cores, rel = _cp_als_iter(data, cores, normsq_data, batch)
            errors.append(float(rel))
            if verbose:
                print(f"iter: {it} | eps: {errors[-1]:.8f}")
            if len(errors) >= 2 and errors[-2] - errors[-1] < tol:
                break
        self.cores = list(cores)

    # ------------------------------------------------------------------
    # Arithmetic (reference tensor.py:445-830)
    # ------------------------------------------------------------------
    @property
    def _m(self) -> int:
        """ndim of a CP factor in this tensor's layout."""
        return 3 if self.batch else 2

    def _is_tt(self, core) -> bool:
        return core.ndim == self._m + 1

    @_policy_precision
    def __add__(self, other):
        if not isinstance(other, Tensor):  # scalar (or per-sample scalars for batch)
            factor = other
            dtype = self.cores[0].dtype
            if self.batch:
                cores = [
                    jnp.ones((self.shape[0], 1, self.shape[n + 1], 1), dtype=dtype)
                    for n in range(self.dim())
                ]
                f = jnp.asarray(factor)
                if f.ndim == 1:  # one scalar per batch sample, shape (B,)
                    factor = f.reshape(-1, 1, 1, 1)
            else:
                cores = [
                    jnp.ones((1, self.shape[n], 1), dtype=dtype)
                    for n in range(self.dim())
                ]
            cores[0] = cores[0] * factor
            other = Tensor(cores, batch=self.batch)

        if self.batch != other.batch:
            raise ValueError(
                "Cannot operate a batch tensor with a non-batch tensor; "
                "stack the non-batch operand into a batch (or index the batch one) first"
            )
        if self.batch and self.shape[0] != other.shape[0]:
            raise ValueError(
                f"Batch dim must match, got {self.shape[0]} and {other.shape[0]}"
            )

        if self.dim() == 1:  # special case (reference tensor.py:479-485)
            m = self._m

            def _one_mode_tt(t):
                # A CP factor's dense values are its COLUMN SUM: raw
                # core-level broadcasting of (I, R) + (1, I, 1) would add
                # the operand once per CP column (R-fold inflation)
                c = t.decompress_tucker_factors().cores[0]
                if c.ndim == m:
                    c = c.sum(axis=-1)[..., None]
                    c = c[:, None] if self.batch else c[None]
                return c

            return Tensor(
                [_one_mode_tt(self) + _one_mode_tt(other)], batch=self.batch
            )

        m = self._m
        d = 1 if self.batch else 0  # left-rank axis of a TT core
        this, other = _broadcast(self, other)

        cores, Us = [], []
        for n in range(this.dim()):
            core1, core2 = this.cores[n], other.cores[n]
            both_cp = core1.ndim == m and core2.ndim == m
            if both_cp:  # lift CP factors to rank-1-left TT views
                core1 = core1[:, None] if self.batch else core1[None]
                core2 = core2[:, None] if self.batch else core2[None]
            else:
                core1 = self._cp_to_tt(core1)
                core2 = self._cp_to_tt(core2)

            if this.Us[n] is not None and other.Us[n] is not None:
                # Block-diagonal core over both rank axes AND the Tucker axis
                b = core1.shape[:1] if self.batch else ()
                R1l, S1, R1r = core1.shape[-3:]
                R2l, S2, R2r = core2.shape[-3:]
                c = jnp.zeros(b + (R1l + R2l, S1 + S2, R1r + R2r), dtype=core1.dtype)
                c = c.at[..., :R1l, :S1, :R1r].set(core1)
                c = c.at[..., R1l:, S1:, R1r:].set(core2)
                cores.append(c)
                Us.append(jnp.concatenate((this.Us[n], other.Us[n]), axis=-1))
                continue

            if this.Us[n] is not None:
                core1 = jnp.einsum("...ijk,...aj->...iak", core1, this.Us[n])
            if other.Us[n] is not None:
                core2 = jnp.einsum("...ijk,...aj->...iak", core2, other.Us[n])

            # Block-diagonal over rank axes, shared spatial axis
            b = core1.shape[:1] if self.batch else ()
            R1l, I, R1r = core1.shape[-3:]
            R2l, _, R2r = core2.shape[-3:]
            c = jnp.zeros(b + (R1l + R2l, I, R1r + R2r), dtype=core1.dtype)
            c = c.at[..., :R1l, :, :R1r].set(core1)
            c = c.at[..., R1l:, :, R1r:].set(core2)
            cores.append(c)
            Us.append(None)

        # Boundary rank-1 collapses (reference tensor.py:656-666)
        if not (this.cores[0].ndim == m and other.cores[0].ndim == m):
            cores[0] = cores[0].sum(axis=d, keepdims=True)
        if not (this.cores[-1].ndim == m and other.cores[-1].ndim == m):
            cores[-1] = cores[-1].sum(axis=m, keepdims=True)
        for n in range(this.dim()):
            if this.cores[n].ndim == m and other.cores[n].ndim == m:
                cores[n] = cores[n].sum(axis=d)

        return Tensor(cores, Us=Us, batch=self.batch)

    def __radd__(self, other):
        if other is None:
            return self
        return self + other

    def __sub__(self, other):
        return self + -1 * other

    def __rsub__(self, other):
        return -1 * self + other

    def __neg__(self):
        return -1 * self

    @_policy_precision
    def __mul__(self, other):
        if not isinstance(other, Tensor):  # scalar: spread |c|^(1/N), sign on core 0
            result = self.clone()
            if self.batch and getattr(jnp.asarray(other), "ndim", 0) == 1:
                # One scalar per batch sample, shape (B,): broadcast over
                # each core's trailing axes (cores may be 4D TT or 3D CP)
                arr = jnp.asarray(other)
                factor = jnp.abs(arr) ** (1.0 / self.dim())
                sign = jnp.sign(arr)
                result.cores = [
                    c * factor.reshape((-1,) + (1,) * (c.ndim - 1)).astype(c.dtype)
                    for c in result.cores
                ]
                c0 = result.cores[0]
                result.cores[0] = c0 * sign.reshape((-1,) + (1,) * (c0.ndim - 1)).astype(c0.dtype)
                return result
            # Keep the cores' dtype: a bare np.float64 factor would silently
            # promote f32 cores under jax_enable_x64 (the batch branch above
            # already casts)
            factor = np.abs(other) ** (1.0 / self.dim())
            result.cores = [c * jnp.asarray(factor, dtype=c.dtype) for c in result.cores]
            result.cores[0] = result.cores[0] * jnp.asarray(
                np.sign(other), dtype=result.cores[0].dtype
            )
            return result

        m = self._m
        this, other = _broadcast(self, other)
        cores, Us = [], []
        for n in range(this.dim()):
            core1, core2 = this.cores[n], other.cores[n]
            both_cp = core1.ndim == m and core2.ndim == m
            if both_cp:
                core1 = core1[:, None] if self.batch else core1[None]
                core2 = core2[:, None] if self.batch else core2[None]
            else:
                core1 = this._cp_to_tt(core1)
                core2 = this._cp_to_tt(core2)

            d1 = this.cores[n].shape[-2] * other.cores[n].shape[-2]
            spatial = this.shape[n + 1] if self.batch else this.shape[n]
            if this.Us[n] is not None and other.Us[n] is not None and d1 < spatial:
                # Keep Tucker structure: kron the cores and the factors
                b = core1.shape[:1] if self.batch else ()
                c = jnp.einsum("...ijk,...abc->...iajbkc", core1, core2)
                cores.append(
                    c.reshape(
                        b
                        + (
                            core1.shape[-3] * core2.shape[-3],
                            core1.shape[-2] * core2.shape[-2],
                            core1.shape[-1] * core2.shape[-1],
                        )
                    )
                )
                U = jnp.einsum("...ij,...ik->...ijk", this.Us[n], other.Us[n])
                Us.append(U.reshape(U.shape[:-2] + (-1,)))
            else:
                if this.Us[n] is not None:
                    core1 = jnp.einsum("...ijk,...aj->...iak", core1, this.Us[n])
                if other.Us[n] is not None:
                    core2 = jnp.einsum("...ijk,...aj->...iak", core2, other.Us[n])
                cores.append(_core_kron(core1, core2, self.batch))
                Us.append(None)

            if both_cp:
                cores[-1] = cores[-1][:, 0] if self.batch else cores[-1][0]
        return Tensor(cores, Us=Us, batch=self.batch)

    def __rmul__(self, other):
        return self * other

    def __truediv__(self, other):
        # Reference behavior (the surviving definition, tensor.py:801-803):
        # t / x == t * (1/x); for tensor x the reciprocal is cross-approximated.
        if isinstance(other, Tensor):
            return self * tn.reciprocal(other)
        return self * (1.0 / other)

    def __rtruediv__(self, other):
        return other * tn.reciprocal(self)

    def __pow__(self, other):
        # Fixed vs reference tensor.py:789-795 (NameError on `power`).
        if isinstance(other, Tensor):
            return tn.cross(function=lambda x, y: x**y, tensors=[self, other], verbose=False)
        return tn.cross(function=lambda x: x**other, tensors=[self], verbose=False)

    def __rpow__(self, other):
        # scalar ** tensor (the one reflected op the reference family lacks)
        return tn.cross(function=lambda x: other**x, tensors=[self], verbose=False)

    # Boolean algebra on {0,1} tensors (reference tensor.py:809-830)
    def __invert__(self):
        return 1 - self

    def __and__(self, other):
        return self * other

    def __or__(self, other):
        return self + other - self * other

    def __xor__(self, other):
        return self + other - 2 * self * other

    def __eq__(self, other):
        try:
            # dist is (B,) for batch tensors: equal iff EVERY sample matches
            return bool(jnp.all(tn.dist(self, other) <= 1e-14))
        except jax.errors.TracerBoolConversionError as e:
            raise ValueError(
                "Tensor == returns a Python bool (reference semantics) and "
                "cannot be traced inside jit; compare traceably with "
                "tn.dist(a, b) <= tol instead"
            ) from e

    def __ne__(self, other):
        return not self == other

    __hash__ = None  # mutable container

    # ------------------------------------------------------------------
    # Shapes and ranks (reference tensor.py:836-919)
    # ------------------------------------------------------------------
    @property
    def shape(self):
        shape = []
        if self.batch:
            shape.append(self.cores[0].shape[0])
        for n in range(self.dim()):
            if self.Us[n] is None:
                shape.append(self.cores[n].shape[-2])
            else:
                shape.append(self.Us[n].shape[-2])
        return tuple(shape)

    def b(self):
        if not self.batch:
            raise ValueError
        return self.cores[0].shape[0]

    @property
    def ranks_tt(self):
        if self.cores[0].ndim == self._m:  # CP factor: rank = its last axis
            first = self.cores[0].shape[-1]
        else:  # TT core: left rank
            first = self.cores[0].shape[1 if self.batch else 0]
        return np.array([first] + [c.shape[-1] for c in self.cores])

    @ranks_tt.setter
    def ranks_tt(self, value):
        self.round_tt(rmax=value)

    @property
    def ranks_tucker(self):
        return np.array([c.shape[-2] for c in self.cores])

    @ranks_tucker.setter
    def ranks_tucker(self, value):
        self.round_tucker(rmax=value)

    def dim(self):
        return len(self.cores)

    def size(self):
        return self.shape

    def __repr__(self):
        # ASCII tensor-network diagram (reference tensor.py:921-1013)
        fmt = []
        if any(self._is_tt(c) for c in self.cores):
            fmt.append("TT")
        if any(c.ndim == self._m for c in self.cores):
            fmt.append("CP")
        if any(U is not None for U in self.Us):
            fmt.append("Tucker")
        s = "{}D {} tensor:\n\n".format(self.dim(), "-".join(fmt))
        ttr = self.ranks_tt
        tuckerr = self.ranks_tucker
        if self.batch:
            s += "with batch = {}\n".format(self.cores[0].shape[0])

        shape = self.shape[1 if self.batch else 0:]
        if any(U is not None for U in self.Us):
            row = [" "] * (4 * self.dim() - 1)
            for n in range(self.dim()):
                if self.Us[n] is None:
                    continue
                t = str(shape[n])
                p = n * 4 - len(t) // 2 + 2
                row[p:p + len(t)] = t
            s += "".join(row) + "\n"

        row = [" "] * (4 * self.dim() - 1)
        for n in range(self.dim()):
            if self.Us[n] is None:
                t = str(tuckerr[n])
                p = n * 4 - len(t) // 2 + 2
                row[p:p + len(t)] = t
            else:
                row[n * 4 + 2] = "|"
        s += "".join(row) + "\n"

        row = [" "] * (4 * self.dim() - 1)
        for n in range(self.dim()):
            if self.Us[n] is None:
                row[n * 4 + 2] = "|"
            else:
                t = str(tuckerr[n])
                p = n * 4 - len(t) // 2 + 2
                row[p:p + len(t)] = t
        s += "".join(row) + "\n"

        row = [" "] * (4 * self.dim() - 1)
        for n in range(self.dim()):
            node = "<{}>".format(n) if self.cores[n].ndim == self._m else "({})".format(n)
            p = (n + 1) * 4 - (len(node) - 1) // 2
            row[p:p + len(node)] = node
        s += "".join(row[2:]) + "\n"
        s += " / \\" * self.dim() + "\n"

        row = [" "] * (4 * (self.dim() + 1))
        for n in range(self.dim() + 1):
            t = str(ttr[n])
            row[n * 4:n * 4 + len(t)] = t
        s += "".join(row) + "\n"
        return s

    # ------------------------------------------------------------------
    # Indexing (reference tensor.py:1019-1434)
    # ------------------------------------------------------------------
    def _process_key(self, key):
        if not hasattr(key, "__len__"):
            key = (key,)
        fancy = False
        if isinstance(key, (jax.Array,)) or type(key).__module__.startswith("torch"):
            key = to_numpy(key)
        if isinstance(key, np.ndarray) and key.ndim == 1:
            key = list(key)
        if any(not np.isscalar(k) for k in key):
            key = list(key)
            fancy = True
        if isinstance(key, tuple):
            key = list(key)
        elif not fancy:
            key = [key]

        nonecount = sum(1 for k in key if k is None)
        for i in range(len(key)):
            if key[i] is Ellipsis:
                key = (
                    key[:i]
                    + [slice(None)] * (len(self.shape) - (len(key) - nonecount) + 1)
                    + key[i + 1:]
                )
                break
        if any(k is Ellipsis for k in key):
            raise IndexError("Only one ellipsis is allowed, at most")
        if len(self.shape) - (len(key) - nonecount) < 0:
            raise IndexError(
                "Too many index entries {} vs {}".format(
                    len(self.shape), len(key) - nonecount
                )
            )
        key = key + [slice(None)] * (len(self.shape) - (len(key) - nonecount))
        return key

    def __getitem__(self, key):
        """NumPy-style indexing over compressed cores; 5 accessor kinds:
        slice / int / index-array / None / mask-Tensor (reference tensor.py:1056-1434).

        The index-merging einsum chains run at the policy's matmul precision
        (on TPU the ambient default is single-pass bf16 — ~1e-3 noise on
        every fancy-indexed evaluation otherwise, even under 'highest')."""
        from tntorch_tpu.utils import matmul_precision

        with jax.default_matmul_precision(matmul_precision()):
            return self._getitem_impl(key)

    def _getitem_impl(self, key):
        if isinstance(key, Tensor):
            if key.batch:
                raise ValueError(
                    "Batch mask Tensors are not supported as indices; "
                    "index with one sample, e.g. t[mask_sample]"
                )
            if abs(float(tn.sum(key)) - 1) > 1e-8:
                raise ValueError(
                    "When indexing via a mask tensor, that mask should have exactly 1 accepting string"
                )
            s = to_numpy(tn.accepted_inputs(key)[0])
            slicing = []
            for n in range(len(self.shape)):
                idx = np.asarray(self.idxs[n]).astype(np.int64).copy()
                idx[idx > 1] = 1
                w = np.where(idx == s[n])[0]
                sl = slice(int(w[0]), int(w[-1]) + 1)
                if len(w) == 1:
                    sl = int(w[0])
                slicing.append(sl)
            return self[tuple(slicing)]

        if isinstance(key, (jax.Array, np.ndarray)) and np.ndim(key) == 2:
            key = to_numpy(key)
            key = [key[:, col] for col in range(key.shape[1])]
        elif type(key).__module__.startswith("torch") and key.ndim == 2:
            key = to_numpy(key)
            key = [key[:, col] for col in range(key.shape[1])]

        key = self._process_key(key)
        batch = self.batch
        B = "b" if batch else ""  # einsum prefix for the batch axis

        if batch:
            batch_dim_processed = False
            batch_dim_idx: Any = slice(None)

        def nd(x):
            """ndim not counting the batch axis (post batch-slicing with int keeps axis)."""
            return x.ndim - (1 if batch else 0)

        last_mode = None
        factors = {"int": None, "index": None, "index_done": False}
        cores: list = []
        Us: list = []
        counter = 0
        first_index_dim = None

        def bsel(x):
            """Apply the pending batch index, keeping a leading batch axis."""
            if not batch:
                return x
            y = x[batch_dim_idx]
            if isinstance(batch_dim_idx, (int, np.integer)):
                y = y[None]
            return y

        def join_cores(c1, c2):
            n1, n2 = nd(c1), nd(c2)
            if n1 == 1 and n2 == 2:
                return jnp.einsum(f"{B}i,{B}ai->{B}ai", c1, c2)
            if n1 == 2 and n2 == 2:
                return jnp.einsum(f"{B}ij,{B}aj->{B}iaj", c1, c2)
            if n1 == 1 and n2 == 3:
                return jnp.einsum(f"{B}i,{B}iaj->{B}iaj", c1, c2)
            if n1 == 2 and n2 == 3:
                return jnp.einsum(f"{B}ij,{B}jak->{B}iak", c1, c2)
            raise ValueError

        def insert_core(core=None, key=None, U=None):
            if factors["index"] is not None:
                if factors["int"] is not None:
                    factors["index"] = join_cores(factors["int"], factors["index"])
                    factors["int"] = None
                cores.append(factors["index"])
                Us.append(None)
                factors["index"] = None
                factors["index_done"] = True
            if core is not None:
                if U is None:
                    nCore = bsel(core[..., key, :])
                    nU = None
                else:
                    nU = bsel(U[..., key, :])
                    nCore = bsel(core)
                if factors["int"] is not None:
                    cores.append(join_cores(factors["int"], nCore))
                    factors["int"] = None
                else:
                    cores.append(nCore)
                Us.append(nU)

        def get_key(cnt, k):
            """Slice mode `cnt` at `k` (int or array), absorbing the Tucker factor."""
            if self.Us[cnt] is None:
                return bsel(take_mode(self.cores[cnt], k))
            sl = bsel(take_mode(self.Us[cnt], k))
            core = bsel(self.cores[cnt])
            if nd(sl) == 1:  # k was an int
                if nd(core) == 3:
                    return jnp.einsum(f"{B}ijk,{B}j->{B}ik", core, sl)
                return jnp.einsum(f"{B}ji,{B}j->{B}i", core, sl)
            if nd(core) == 3:
                return jnp.einsum(f"{B}ijk,{B}aj->{B}iak", core, sl)
            return jnp.einsum(f"{B}ji,{B}aj->{B}ai", core, sl)

        for i in range(len(key)):
            if hasattr(key[i], "__len__"):
                this_mode = "index"
            elif key[i] is None:
                this_mode = "none"
            elif isinstance(key[i], (int, np.integer)):
                this_mode = "int"
            elif isinstance(key[i], slice):
                this_mode = "slice"
            else:
                raise IndexError

            if this_mode == "none":
                if batch:
                    if not batch_dim_processed:
                        raise ValueError("Cannot change batch dimension")
                    r = int(self.ranks_tt[counter - 1])
                    eye = jnp.tile(
                        jnp.eye(r, dtype=self.cores[0].dtype)[None],
                        (self.shape[0], 1, 1),
                    )
                    insert_core(eye[:, :, None, :], key=slice(None), U=None)
                else:
                    r = int(self.ranks_tt[counter])
                    insert_core(
                        jnp.eye(r, dtype=self.cores[0].dtype)[:, None, :],
                        key=slice(None), U=None,
                    )
            elif this_mode == "slice":
                if batch and not batch_dim_processed:
                    batch_dim_processed = True
                    batch_dim_idx = key[i]
                else:
                    c = counter - 1 if batch else counter
                    insert_core(self.cores[c], key=key[i], U=self.Us[c])
                counter += 1
            elif this_mode == "index":
                k = np.asarray(key[i])
                if batch and first_index_dim == 0:
                    raise ValueError("Advanced indexing is prohibited for batch dimension")
                if factors["index_done"]:
                    raise IndexError("All index arrays must appear contiguously")
                if factors["index"] is None:
                    if batch:
                        if first_index_dim is None:
                            first_index_dim = i
                        if batch_dim_processed:
                            factors["index"] = get_key(counter - 1, k)
                        else:
                            batch_dim_processed = True
                            batch_dim_idx = k
                    else:
                        factors["index"] = get_key(counter, k)
                else:
                    if factors["index"].shape[-2] != len(k):
                        raise ValueError("Index arrays must have the same length")
                    a1 = factors["index"]
                    a2 = get_key(counter - 1 if batch else counter, k)
                    n1, n2 = nd(a1), nd(a2)
                    if n1 == 2 and n2 == 2:
                        factors["index"] = jnp.einsum(f"{B}ai,{B}ai->{B}ai", a1, a2)
                    elif n1 == 2 and n2 == 3:
                        factors["index"] = jnp.einsum(f"{B}ai,{B}iaj->{B}iaj", a1, a2)
                    elif n1 == 3 and n2 == 2:
                        factors["index"] = jnp.einsum(f"{B}iaj,{B}aj->{B}iaj", a1, a2)
                    elif n1 == 3 and n2 == 3:
                        factors["index"] = jnp.einsum(f"{B}iaj,{B}jak->{B}iak", a1, a2)
                counter += 1
            elif this_mode == "int":
                if batch and not batch_dim_processed:
                    batch_dim_processed = True
                    batch_dim_idx = key[i]
                else:
                    if last_mode == "index":
                        insert_core()
                    c2v = get_key(counter - 1 if batch else counter, int(key[i]))
                    if factors["int"] is None:
                        factors["int"] = c2v
                    else:
                        c1 = factors["int"]
                        n1, n2 = nd(c1), nd(c2v)
                        if n1 == 1 and n2 == 1:
                            factors["int"] = jnp.einsum(f"{B}i,{B}i->{B}i", c1, c2v)
                        elif n1 == 1 and n2 == 2:
                            factors["int"] = jnp.einsum(f"{B}i,{B}ij->{B}ij", c1, c2v)
                        elif n1 == 2 and n2 == 1:
                            factors["int"] = jnp.einsum(f"{B}ij,{B}j->{B}ij", c1, c2v)
                        elif n1 == 2 and n2 == 2:
                            factors["int"] = jnp.einsum(f"{B}ij,{B}jk->{B}ik", c1, c2v)
                counter += 1
            last_mode = this_mode

        # Pending factors at the end
        if last_mode == "index":
            insert_core()
        elif last_mode == "int" and factors["int"] is not None:
            if len(cores) > 0:
                last = cores[-1]
                if batch:
                    last = bsel(last) if last.shape[0] != factors["int"].shape[0] else last
                n1, n2 = nd(last), nd(factors["int"])
                if n1 == 2 and n2 == 1:
                    cores[-1] = jnp.einsum(f"{B}ai,{B}i->{B}ai", last, factors["int"])
                elif n1 == 2 and n2 == 2:
                    cores[-1] = jnp.einsum(f"{B}ai,{B}ij->{B}iaj", last, factors["int"])
                elif n1 == 3 and n2 == 1:
                    cores[-1] = jnp.einsum(f"{B}iaj,{B}j->{B}ai", last, factors["int"])
                elif n1 == 3 and n2 == 2:
                    cores[-1] = jnp.einsum(f"{B}iaj,{B}jk->{B}iak", last, factors["int"])
            else:  # scalar result (per sample in batch mode)
                f = factors["int"]
                # Any surviving axes are CP-rank / boundary-rank artifacts;
                # the contraction sums them (size-1 axes sum to themselves).
                # The reference leaves a rank-R vector here for CP input —
                # a latent defect its own non-batch path avoids.
                if not batch or isinstance(batch_dim_idx, (int, np.integer)):
                    return jnp.sum(f)
                return jnp.sum(f, axis=tuple(range(1, f.ndim))) if f.ndim > 1 else f

        if batch and isinstance(batch_dim_idx, (int, np.integer)):
            nUs = [None if U is None else U[0] for U in Us]
            return Tensor([c[0] for c in cores], Us=nUs, batch=False)
        return Tensor(cores, Us=Us, batch=self.batch)

    def __setitem__(self, key, value):
        """Algebraic assignment: self <- self - old_slice + new (reference tensor.py:1436-1563)."""
        if any(U is not None for U in self.Us):
            # The scatters below index CORES by mode-space keys, which is
            # only meaningful without Tucker factors; fold them in first
            t2 = self.decompress_tucker_factors()
            self.cores = t2.cores
            self.Us = t2.Us
        if any(c.ndim == self._m for c in self.cores):
            # CP factors: convert to TT form first — the add-core scatters
            # below are TT-shaped (a CP factor's axis -2 is its rank, so the
            # raw indexing would silently compare/scatter the wrong axis)
            self._cp_to_tt()
        key = self._process_key(key)
        scalar = False
        if isinstance(value, np.ndarray) or type(value).__module__.startswith("torch") or isinstance(value, jax.Array):
            value = asarray(value)
            if value.ndim == 0:
                value = float(value)
                scalar = True
            else:
                if self.batch:
                    if isinstance(key[0], (int, np.integer)):
                        value = value[None]
                    if value.ndim == 1:
                        value = value[:, None]
                value = Tensor(value, batch=self.batch)
        elif isinstance(value, Tensor):
            if any(c.ndim == value._m for c in value.cores) or any(
                U is not None for U in value.Us
            ):
                # Same TT normalization as `self`: the scatters consume
                # 3D/4D TT value cores
                value = value.clone()
                value = value.decompress_tucker_factors(_clone=False)
                value._cp_to_tt()
        else:
            scalar = True

        subtract_cores = []
        add_cores = []
        key_length = len(key) - (1 if self.batch else 0)
        dtype = self.cores[0].dtype

        # Duplicate entries in a fancy index must resolve to LAST-write
        # (numpy/torch assignment semantics). JAX documents the order of
        # duplicate-index .at[].set as unspecified, so deduplicate on the
        # host keeping each index's last occurrence (and select the matching
        # rows of `value`) before any scatter.
        for i in range(key_length):
            ki = i + 1 if self.batch else i
            kk = key[ki]
            if isinstance(kk, slice) or not hasattr(kk, "__len__"):
                continue
            arr = np.asarray(kk)
            if arr.ndim != 1 or arr.dtype == bool:
                continue
            mode_size = int(self.shape[i + 1] if self.batch else self.shape[i])
            arr = np.where(arr < 0, arr + mode_size, arr).astype(np.int64)
            if len(np.unique(arr)) != len(arr):
                last = {int(v): p for p, v in enumerate(arr)}
                keep = np.sort(np.asarray(sorted(last.values()), dtype=np.int64))
                voff = 1 if (isinstance(value, Tensor) and value.batch) else 0
                if not scalar and isinstance(value, Tensor) and i < value.dim() and int(
                    value.shape[i + voff]
                ) == len(arr):
                    sel: list = [slice(None)] * (value.dim() + voff)
                    sel[i + voff] = keep.tolist()
                    value = value[tuple(sel)]
                    arr = arr[keep]
                elif scalar:
                    arr = arr[keep]
            key[ki] = arr

        if self.batch and not isinstance(key[0], slice) and not hasattr(key[0], "__len__"):
            # Integer batch index: keep the batch axis as a length-1 slice
            # (dropping it would misalign every scatter below — the
            # reference converts it the same way, tensor.py:1466)
            k0 = int(key[0])
            k0 = k0 + self.shape[0] if k0 < 0 else k0
            key[0] = slice(k0, k0 + 1)

        for i in range(key_length):
            ki = i + 1 if self.batch else i
            if not isinstance(key[ki], slice) and not hasattr(key[ki], "__len__"):
                # Normalize negative ints (slice(-1, 0) is EMPTY — the
                # reference's unnormalized conversion silently no-ops t[-1]=v)
                kk = int(key[ki])
                mode_size = self.shape[i + 1] if self.batch else self.shape[i]
                kk = kk + int(mode_size) if kk < 0 else kk
                key[ki] = slice(kk, kk + 1)

            # Scatters below use .set, not .add: duplicate fancy indices must
            # resolve to last-write (numpy/torch assignment semantics), not
            # accumulate
            if self.batch:
                chunk = self.cores[i][key[0], ..., key[i + 1], :]
                subtract_core = jnp.zeros_like(self.cores[i]).at[key[0], ..., key[i + 1], :].set(chunk)
                sh = chunk.shape[-2]
                k = i + 1
            else:
                chunk = self.cores[i][..., key[i], :]
                subtract_core = jnp.zeros_like(self.cores[i]).at[..., key[i], :].set(chunk)
                sh = chunk.shape[-2]
                k = i
            subtract_cores.append(subtract_core)

            if scalar:
                if self.batch:
                    if self.cores[i].ndim == 4:
                        add_core = jnp.zeros((self.shape[0], 1, self.shape[i + 1], 1), dtype=dtype)
                    else:
                        add_core = jnp.zeros((self.shape[0], self.shape[i + 1], 1), dtype=dtype)
                    add_core = add_core.at[key[0], ..., key[i + 1], :].set(1)
                else:
                    if self.cores[i].ndim == 3:
                        add_core = jnp.zeros((1, self.shape[i], 1), dtype=dtype)
                    else:
                        add_core = jnp.zeros((self.shape[i], 1), dtype=dtype)
                    add_core = add_core.at[..., key[i], :].set(1)
                if i == 0:
                    add_core = add_core * value
            else:
                if len(value.shape) != len(key):
                    # An int-keyed mode (selection width 1) was dropped from
                    # `value`: re-insert the singleton AT THIS MODE'S position
                    # (appending regardless of position misplaced the axis
                    # for every non-trailing int key)
                    if k >= len(value.shape):
                        value = tn.unsqueeze(value, value.dim())
                    elif sh == 1:
                        if value.shape[k] == sh:
                            value = tn.unsqueeze(value, value.dim())
                        else:
                            cur = list(value.shape)
                            new_shape = cur[:k] + [1] + cur[k:]
                            value = Tensor(
                                value.full().reshape(new_shape), batch=self.batch
                            )
                if self.batch:
                    if self.cores[i].ndim == 4:
                        add_core = jnp.zeros(
                            (self.cores[i].shape[0], value.cores[i].shape[1],
                             self.shape[i + 1], value.cores[i].shape[3]),
                            dtype=dtype,
                        )
                    else:
                        add_core = jnp.zeros(
                            (self.cores[i].shape[0], self.shape[i + 1], value.cores[i].shape[2]),
                            dtype=dtype,
                        )
                    add_core = add_core.at[key[0], ..., key[i + 1], :].set(value.cores[i])
                else:
                    if chunk.shape[1] != value.shape[i]:
                        raise ValueError(
                            "{}-th dimension mismatch in tensor assignment: {} (lhs) != {} (rhs)".format(
                                i, chunk.shape[1], value.shape[i]
                            )
                        )
                    if self.cores[i].ndim == 3:
                        add_core = jnp.zeros(
                            (value.cores[i].shape[0], self.shape[i], value.cores[i].shape[2]),
                            dtype=dtype,
                        )
                    else:
                        add_core = jnp.zeros((self.shape[i], value.cores[i].shape[1]), dtype=dtype)
                    add_core = add_core.at[..., key[i], :].set(value.cores[i])
            add_cores.append(add_core)

        result = (
            self
            - Tensor(subtract_cores, batch=self.batch)
            + Tensor(add_cores, batch=self.batch)
        )
        # __init__ resets trainability state; assignment must preserve it
        rg, fu = self.requires_grad, set(getattr(self, "frozen_Us", ()))
        self.__init__(result.cores, result.Us, self.idxs, batch=self.batch)
        self.requires_grad = rg
        self.frozen_Us = fu

    # ------------------------------------------------------------------
    # Decompression (reference tensor.py:1565-1715)
    # ------------------------------------------------------------------
    def tucker_core(self):
        return Tensor(list(self.cores), batch=self.batch).full()

    def decompress_tucker_factors(self, dim="all", _clone: bool = True):
        from tntorch_tpu.utils import matmul_precision

        with jax.default_matmul_precision(matmul_precision()):
            return self._decompress_tucker_factors_impl(dim, _clone)

    def _decompress_tucker_factors_impl(self, dim="all", _clone: bool = True):
        if dim == "all":
            dim = range(self.dim())
        if not hasattr(dim, "__len__"):
            dim = [dim] * self.dim()

        cores, Us = [], []
        for n in range(self.dim()):
            if n in dim and self.Us[n] is not None:
                if self.cores[n].ndim == self._m:
                    cores.append(jnp.einsum("...jk,...aj->...ak", self.cores[n], self.Us[n]))
                else:
                    cores.append(jnp.einsum("...ijk,...aj->...iak", self.cores[n], self.Us[n]))
                Us.append(None)
            else:
                cores.append(self.cores[n])
                Us.append(self.Us[n])
        # getattr: __init__'s rank-rounding calls run before self.idxs is
        # assigned, and round_tt may decompress factors on the way
        return Tensor(cores, Us, idxs=getattr(self, "idxs", None), batch=self.batch)

    def tt(self):
        t = self.decompress_tucker_factors()
        t._cp_to_tt()
        return t

    def full(self) -> jax.Array:
        """Decompress to a dense jnp array (reference `torch()`, tensor.py:1639-1687).

        Contractions are pinned to exact ('highest') matmul precision
        regardless of the performance policy: decompression is the oracle /
        diagnostic path, and on TPU the ambient default is single-pass bf16,
        which would put ~1e-2 noise on every ``numpy()`` reconstruction
        (caught by tests/test_tpu_live.py)."""
        with jax.default_matmul_precision("highest"):
            return self._full_impl()

    def _full_impl(self) -> jax.Array:
        # Call the impl directly: the public decompress_tucker_factors wrapper
        # re-enters default_matmul_precision at the (possibly lower) policy
        # precision, and the innermost context wins — which would silently
        # undo full()'s 'highest' pin for the factor-absorption einsums.
        t = self._decompress_tucker_factors_impl(_clone=False)
        dtype = t.cores[0].dtype
        m = self._m
        if self.batch:
            bshape = (self.cores[0].shape[0],)
        else:
            bshape = ()
        factor = jnp.ones(bshape + (1, int(self.ranks_tt[0])), dtype=dtype)
        shape = list(bshape)
        for n in range(t.dim()):
            shape.append(t.cores[n].shape[-2])
            if t.cores[n].ndim == m:  # CP factor
                if n < t.dim() - 1:
                    factor = jnp.einsum("...ai,...bi->...abi", factor, t.cores[n])
                else:
                    factor = jnp.einsum("...ai,...bi->...ab", factor, t.cores[n])[..., None]
            else:  # TT core
                factor = jnp.einsum("...ai,...ibj->...abj", factor, t.cores[n])
            factor = factor.reshape(bshape + (-1, factor.shape[-1]))
        if factor.shape[-1] > 1:
            factor = factor.sum(axis=-1)
        else:
            factor = factor[..., 0]
        return factor.reshape(shape)

    def numpy(self) -> np.ndarray:
        return np.asarray(self.full())

    def torch(self):
        """Decompress to a (CPU) PyTorch tensor, for reference-API parity."""
        import torch

        return torch.from_numpy(np.asarray(self.full()))

    def to(self, device):
        for i in range(self.dim()):
            self.cores[i] = jax.device_put(self.cores[i], device)
            if self.Us[i] is not None:
                self.Us[i] = jax.device_put(self.Us[i], device)
        return self

    def _cp_to_tt(self, factor=None):
        """CP factor -> TT core with diagonal slices (reference tensor.py:1717-1765).

        C[..., a, i, b] = delta(a, b) * factor[..., i, a] — built directly with
        an identity mask instead of the reference's reshape trick.
        """
        m = self._m
        if factor is None:
            if self.cores[0].ndim == m:
                self.cores[0] = self.cores[0][:, None] if self.batch else self.cores[0][None]
            for mu in range(1, self.dim() - 1):
                self.cores[mu] = self._cp_to_tt(self.cores[mu])
            if self.cores[-1].ndim == m:
                self.cores[-1] = jnp.swapaxes(self.cores[-1], -1, -2)[..., None]
            return
        if factor.ndim == m + 1:
            return factor
        R = factor.shape[-1]
        eye = jnp.eye(R, dtype=factor.dtype)
        ft = jnp.swapaxes(factor, -1, -2)  # (..., R, I)
        return eye[..., :, None, :] * ft[..., :, :, None]

    # ------------------------------------------------------------------
    # Rounding and orthogonalization (reference tensor.py:1771-2098)
    # ------------------------------------------------------------------
    @_policy_precision
    def factor_orthogonalize(self, mu: int):
        if self.Us[mu] is None:
            return
        Q, R = jnp.linalg.qr(self.Us[mu])
        self.Us[mu] = Q
        if self.cores[mu].ndim == self._m:
            self.cores[mu] = jnp.einsum("...jk,...aj->...ak", self.cores[mu], R)
        else:
            self.cores[mu] = jnp.einsum("...ijk,...aj->...iak", self.cores[mu], R)

    @_policy_precision
    def left_orthogonalize(self, mu: int):
        """QR the mu-th core's left unfolding; push R right (reference tensor.py:1800-1833)."""
        assert 0 <= mu < self.dim() - 1
        self.factor_orthogonalize(mu)
        Q, R = jnp.linalg.qr(tn.left_unfolding(self.cores[mu], batch=self.batch))
        self.cores[mu] = Q.reshape(self.cores[mu].shape[:-1] + (Q.shape[-1],))
        rightcoreR = tn.right_unfolding(self.cores[mu + 1], batch=self.batch)
        self.cores[mu + 1] = (R @ rightcoreR).reshape(
            R.shape[:-1] + self.cores[mu + 1].shape[-2:]
        )
        return R

    @_policy_precision
    def right_orthogonalize(self, mu: int):
        """LQ (via QR of the transpose) on the right unfolding; push L left."""
        assert 1 <= mu < self.dim()
        self.factor_orthogonalize(mu)
        Mt = jnp.swapaxes(tn.right_unfolding(self.cores[mu], batch=self.batch), -1, -2)
        Q, L = jnp.linalg.qr(Mt)
        L = jnp.swapaxes(L, -1, -2)
        Q = jnp.swapaxes(Q, -1, -2)
        self.cores[mu] = Q.reshape(Q.shape[:-1] + self.cores[mu].shape[-2:])
        leftcoreL = tn.left_unfolding(self.cores[mu - 1], batch=self.batch)
        self.cores[mu - 1] = (leftcoreL @ L).reshape(
            self.cores[mu - 1].shape[:-1] + (L.shape[-1],)
        )
        return L

    def orthogonalize(self, mu: int):
        """Make the tensor mu-orthogonal via QR sweeps (reference tensor.py:1881-1909)."""
        if mu < 0:
            mu += self.dim()
        self._cp_to_tt()
        bshape = (self.cores[0].shape[0],) if self.batch else ()
        dtype = self.cores[0].dtype
        L = jnp.ones(bshape + (1, 1), dtype=dtype)
        R = jnp.ones(bshape + (1, 1), dtype=dtype)
        if (
            mu == self.dim() - 1
            and not self.batch
            and all(U is None for U in self.Us)
        ):
            # Pure-TT full left-orthogonalization: one jitted XLA program
            # instead of an eager QR dispatch per mode
            from tntorch_tpu.ops.rounding import left_orthogonalize_sweep

            self.cores = list(left_orthogonalize_sweep(tuple(self.cores)))
            return R, L
        for i in range(mu):
            R = self.left_orthogonalize(i)
        for i in range(self.dim() - 1, mu, -1):
            L = self.right_orthogonalize(i)
        return R, L

    @_policy_precision
    def round_tucker(self, eps: float = 1e-14, rmax=None, dim="all", algorithm: str = "svd"):
        """Reduce Tucker ranks in place (reference tensor.py:1911-2006)."""
        N = self.dim()
        if not hasattr(rmax, "__len__"):
            rmax = [rmax] * N
        assert len(rmax) == N
        if dim == "all":
            dim = range(N)
        if not hasattr(dim, "__len__"):
            dim = [dim] * N

        for m in dim:
            self.cores[m] = self._cp_to_tt(self.cores[m])

        if (
            algorithm in ("eig", "svd")
            and self.batch
            and all(U is None for U in self.Us)
            and all(self._is_tt(c) for c in self.cores)
        ):
            # Batch Tucker rounding: fixed rank min(rmax, full) per factor
            # (the reference's batch truncated_svd rule) — the non-batch
            # masked kernel vmapped with eps=0, so batch-vs-loop agreement
            # is exact per sample (tests/test_tensor.py)
            from tntorch_tpu.ops.rounding import round_tucker_eps_batch

            dtype = self.cores[0].dtype
            us = [jnp.eye(self.shape[n + 1], dtype=dtype) for n in range(N)]
            with tn.utils.trace_annotation("tn.round_tucker:batch_kernel"):
                self.cores, self.Us = round_tucker_eps_batch(
                    tuple(self.cores), tuple(us),
                    rmax=rmax, dims=tuple(dim), algorithm=algorithm,
                )
            return

        if (
            algorithm in ("eig", "svd")
            and not self.batch
            and all(U is None for U in self.Us)
            and all(self._is_tt(c) for c in self.cores)
        ):
            # Adaptive Tucker-eps fast path for pure-TT input (the common
            # flow: dense->TT->round_tucker, and round()'s combined pass):
            # the whole sweep (orthogonalize, QR pushes, factor truncations)
            # in ONE jitted program + a single host sync for the effective
            # ranks (the eager loop below syncs per mode inside
            # truncated_svd). Pre-existing Us take the eager path, which
            # factor-orthogonalizes them first.
            from tntorch_tpu.ops.rounding import round_tucker_eps

            dtype = self.cores[0].dtype
            us = [
                jnp.eye(self.shape[n], dtype=dtype) if self.Us[n] is None else self.Us[n]
                for n in range(N)
            ]
            with tn.utils.trace_annotation("tn.round_tucker:eps_kernel"):
                self.cores, self.Us = round_tucker_eps(
                    tuple(self.cores), tuple(us), eps,
                    rmax=rmax, dims=tuple(dim), algorithm=algorithm,
                )
            return

        self.orthogonalize(-1)
        bshape = (self.cores[0].shape[0],) if self.batch else ()
        for mu in range(N - 1, -1, -1):
            if mu not in dim:
                # Modes the caller asked to leave alone are only passed
                # through by the orthogonalization sweep. (The reference
                # truncates EVERY mode here regardless of `dim`,
                # tensor.py:1945-2006 — a defect; the jitted fast paths
                # above honor `dims`, so the eager path must too.)
                if mu > 0:
                    self.right_orthogonalize(mu)
                continue
            dtype = self.cores[mu].dtype
            if self.Us[mu] is None:
                sp = self.shape[mu + 1] if self.batch else self.shape[mu]
                eye = jnp.eye(sp, dtype=dtype)
                self.Us[mu] = jnp.tile(eye[None], bshape + (1, 1)) if self.batch else eye

            # Push the core's non-orthogonality into the factor
            core = self.cores[mu]
            perm = jnp.swapaxes(core, -1, -2)  # (..., Rl, Rr, S)
            Q, R = jnp.linalg.qr(perm.reshape(bshape + (-1, core.shape[-2])))
            self.cores[mu] = jnp.swapaxes(
                Q.reshape(bshape + (core.shape[-3], core.shape[-1], -1)), -1, -2
            )
            self.Us[mu] = self.Us[mu] @ jnp.swapaxes(R, -1, -2)

            left, right = tn.truncated_svd(
                self.Us[mu],
                eps=eps / np.sqrt(len(dim)),
                rmax=rmax[mu],
                left_ortho=True,
                algorithm=algorithm,
                batch=self.batch,
            )
            self.Us[mu] = left
            self.cores[mu] = jnp.einsum("...ijk,...aj->...iak", self.cores[mu], right)
            if mu > 0:
                self.right_orthogonalize(mu)

    def _round_tt_computes_reached(self, algorithm: str = "svd", verbose: bool = False, **_ignored) -> bool:
        """Whether round_tt will take a kernel path that reports the achieved
        error via ``_round_reached_dev``. ONE definition shared by round_tt's
        dispatch and round()'s clone-avoidance so the two cannot drift."""
        return (
            algorithm in ("eig", "svd")
            and not verbose
            and all(U is None for U in self.Us)
        )

    @_policy_precision
    def round_tt(self, eps: float = 1e-14, rmax=None, algorithm: str = "svd", verbose: bool = False):
        """Reduce TT ranks in place: left-orthogonalize, then a right-to-left
        truncated-SVD sweep with error budget delta = eps*|t|/sqrt(N-1)
        (reference tensor.py:2008-2083)."""
        N = self.dim()
        if not hasattr(rmax, "__len__"):
            rmax = [rmax] * (N - 1)
        assert len(rmax) == N - 1
        # Achieved relative error, when a kernel path computes it from its
        # discarded spectra (DEVICE scalar, lazily synced by round()); None
        # on paths that don't, where round() falls back to an eager
        # relative_error (VERDICT r3 weak #4)
        self._round_reached_dev = None

        if self._round_tt_computes_reached(algorithm, verbose):
            if self.batch:
                # Batch rounding keeps fixed rank min(rmax, rows, cols) per
                # edge (reference round.py:149-150, no error budget): the
                # non-batch masked kernel vmapped with eps=0, so batch and
                # per-sample results agree exactly (tests/test_tensor.py).
                from tntorch_tpu.ops.rounding import round_tt_batch

                self._cp_to_tt()
                with tn.utils.trace_annotation("tn.round_tt:batch_kernel"):
                    self.cores, self._round_reached_dev = round_tt_batch(
                        tuple(self.cores), rmax, algorithm, return_reached=True
                    )
                return
            # Adaptive-eps fast path: masked truncation in ONE jitted program
            # + a single host sync for the effective ranks ('eig' uses Gram
            # spectra, 'svd' a true per-mode SVD — the reference's default)
            from tntorch_tpu.ops.rounding import round_tt_eps

            self._cp_to_tt()
            with tn.utils.trace_annotation("tn.round_tt:eps_kernel"):
                self.cores, self._round_reached_dev = round_tt_eps(
                    tuple(self.cores), eps, rmax, algorithm=algorithm,
                    return_reached=True,
                )
            return

        if algorithm in ("gram", "randgram"):
            # Fixed-rank fast path: single jitted XLA program, all-matmul
            # (see ops/rounding.round_tt_gram). Requires explicit rmax.
            # 'randgram' swaps the per-edge eigh for randomized subspace
            # iteration (quasi-optimal truncation, ~2x faster on TPU).
            # ACCURACY NOTE: the Gram method squares the condition number;
            # in f32 on rank-deficient input (e.g. rounding t+t) expect a
            # ~1e-3 relative error floor — use algorithm='svd'/'eig'
            # (the QR-sweep kernels) or f64 when that matters (PERF.md).
            if any(r is None for r in rmax):
                raise ValueError(f"algorithm='{algorithm}' requires explicit rmax")
            if any(U is not None for U in self.Us):
                # Non-orthogonal factors change the truncation metric;
                # orthogonalizing them (pushing R into the cores) makes the
                # core Gram chain exact WITHOUT destroying the Tucker
                # structure (decompressing here would silently drop the
                # factors a ranks_tucker= constructor just installed)
                for n in range(self.dim()):
                    self.factor_orthogonalize(n)
            from tntorch_tpu.ops.rounding import resolve_edge_solver, round_tt_gram
            from tntorch_tpu.utils import resolve_precision

            # algorithm='gram' follows the precision policy (exact eigh
            # edges under 'highest', randomized subspace edges under the
            # performance policies); 'randgram' forces the randomized edges
            precision = resolve_precision(None)
            solver = resolve_edge_solver(
                "rand" if algorithm == "randgram" else None, precision
            )
            self._cp_to_tt()
            rt = tuple(int(r) for r in rmax)
            if jnp.finfo(self.cores[0].dtype).eps > 1e-10:  # f32/c64 class
                if algorithm == "gram" and precision == "highest":
                    # Accuracy-first routing (the 'highest' policy is a
                    # declaration that precision matters): the Gram method
                    # squares the condition number, so in f32 it carries a
                    # ~1e-3 error floor on rank-deficient input — route to
                    # the QR/SVD-sweep kernel instead. 'randgram' remains an
                    # explicit opt-in to the performance variant.
                    from tntorch_tpu.ops.rounding import round_tt_batch, round_tt_eps

                    with tn.utils.trace_annotation("tn.round_tt:gram_to_svd_route"):
                        if self.batch:
                            self.cores = round_tt_batch(tuple(self.cores), list(rt), "svd")
                        else:
                            self.cores = round_tt_eps(
                                tuple(self.cores), 0.0, list(rt), algorithm="svd"
                            )
                    return
                _warn_f32_gram_once()
            with tn.utils.trace_annotation("tn.round_tt:gram_kernel"):
                if self.batch:
                    if precision == "bf16":
                        # The bf16-in/f32-acc kernel only exists per-sample
                        from tntorch_tpu.ops.rounding import round_tt_gram as _g

                        out = jax.vmap(lambda *cs: tuple(_g(cs, rt, edge_solver=solver)))(
                            *self.cores
                        )
                    else:
                        # Natively-batched body; fused Pallas Gram-chain
                        # edges on TPU when shapes allow
                        from tntorch_tpu.ops.rounding import round_tt_gram_batched

                        use_pallas = jax.default_backend() == "tpu"
                        out = round_tt_gram_batched(
                            tuple(self.cores), rt, solver, use_pallas, precision
                        )
                else:
                    out = round_tt_gram(tuple(self.cores), rt, edge_solver=solver)
            self.cores = list(out)
            return

        self._cp_to_tt()
        self.orthogonalize(N - 1)
        if self.batch:
            delta = None
        else:
            delta = float(
                eps / max(1.0, np.sqrt(N - 1)) * jnp.linalg.norm(self.cores[-1].reshape(-1))
            )

        for mu in range(N - 1, 0, -1):
            M = tn.right_unfolding(self.cores[mu], batch=self.batch)
            left, right = tn.truncated_svd(
                M, delta=delta, rmax=rmax[mu - 1], left_ortho=False,
                algorithm=algorithm, verbose=verbose, batch=self.batch,
            )
            self.cores[mu] = right.reshape(
                (self.cores[mu].shape[:1] if self.batch else ())
                + (-1,) + self.cores[mu].shape[-2:]
            )
            self.cores[mu - 1] = jnp.einsum("...ijk,...kl->...ijl", self.cores[mu - 1], left)

    def round(self, eps: float = 1e-14, **kwargs):
        """TT rounding first, Tucker rounding with the leftover error budget
        (reference tensor.py:2085-2098). On the jitted-kernel round_tt paths
        the budget comes from the kernels' own discarded spectra (the sweep's
        truncations are orthogonal projections, so err^2 = sum of discarded
        sigma^2) — no extra clone/dot-chain dispatches; other paths keep the
        reference's eager relative_error."""
        kernel_path = self._round_tt_computes_reached(
            kwargs.get("algorithm", "svd"), kwargs.get("verbose", False)
        )
        copy = None if kernel_path else self.clone()
        self.round_tt(eps, **kwargs)
        if getattr(self, "_round_reached_dev", None) is not None:
            # max over batch: budget off the WORST sample (one scalar sync)
            reached = float(jnp.max(jnp.asarray(self._round_reached_dev)))
        elif copy is None:
            # Defensive: the shared gate said the kernel would report the
            # reached error but it did not (an internal bail-out path). With
            # no pre-round clone the error cannot be recomputed; skip the
            # Tucker stage — round_tt already guarantees error <= eps, so
            # the contract holds, only some Tucker compression is forfeited.
            reached = eps
        else:
            # relative_error is (B,) for batch tensors: budget off the WORST
            # sample so no sample can exceed eps
            reached = float(jnp.max(jnp.asarray(tn.relative_error(copy, self))))
        if reached < eps:
            # Forward only the kwargs round_tucker understands: round_tt
            # extras like verbose= must not crash the Tucker stage
            tkwargs = {k: v for k, v in kwargs.items()
                       if k in ("rmax", "dim", "algorithm")}
            if tkwargs.get("algorithm") in ("gram", "randomized"):
                tkwargs["algorithm"] = "eig"  # TT-stage-only algorithms
            self.round_tucker((1 + eps) / (1 + reached) - 1, **tkwargs)

    # ------------------------------------------------------------------
    # Convenience methods
    # ------------------------------------------------------------------
    def dot(self, other, **kwargs):
        return tn.dot(self, other, **kwargs)

    def mean(self, **kwargs):
        return tn.mean(self, **kwargs)

    def sum(self, **kwargs):
        return tn.sum(self, **kwargs)

    def var(self, **kwargs):
        return tn.var(self, **kwargs)

    def std(self, **kwargs):
        return tn.std(self, **kwargs)

    def norm(self, **kwargs):
        return tn.norm(self, **kwargs)

    def normsq(self, **kwargs):
        return tn.normsq(self, **kwargs)

    # ------------------------------------------------------------------
    # Miscellaneous
    # ------------------------------------------------------------------
    def set_factors(self, name, dim="all", requires_grad: bool = False):
        """Set Tucker factors from a named basis family (reference tensor.py:2157-2189).

        Like the reference, ``requires_grad`` governs only the NEW FACTORS:
        with the default False they are frozen (excluded from `tn.optimize`
        parameters and from `tn.dof`), while the cores' trainability — the
        tensor-level ``requires_grad`` flag — is left untouched.
        """
        if dim == "all":
            dim = range(self.dim())
        off = 1 if self.batch else 0
        for m in dim:
            if self.Us[m] is None:
                U = tn.generate_basis(name, (self.shape[m + off], self.shape[m + off]))
            else:
                U = tn.generate_basis(name, tuple(self.Us[m].shape[-2:]))
            U = asarray(U, dtype=self.cores[m].dtype)
            if self.batch:
                U = jnp.tile(U[None], (self.shape[0], 1, 1))
            self.Us[m] = U
            if requires_grad:
                self.frozen_Us.discard(m)
            else:
                self.frozen_Us.add(m)

    def as_leaf(self):
        """Detach from any autodiff trace (JAX: stop_gradient on all leaves)."""
        self.cores = [jax.lax.stop_gradient(c) for c in self.cores]
        self.Us = [None if U is None else jax.lax.stop_gradient(U) for U in self.Us]
        return self

    def clone(self):
        t = Tensor(
            list(self.cores),
            Us=list(self.Us),
            idxs=getattr(self, "idxs", None),
            batch=self.batch,
        )
        t.requires_grad = self.requires_grad
        t.frozen_Us = set(getattr(self, "frozen_Us", ()))
        return t

    def numel(self):
        return float(np.round(np.prod([float(s) for s in self.shape])))

    def numcoef(self):
        result = 0
        for n in range(self.dim()):
            result += int(np.prod(self.cores[n].shape))
            if self.Us[n] is not None:
                result += int(np.prod(self.Us[n].shape))
        return result

    def repeat(self, *rep):
        """Tile along modes, like torch.repeat (reference tensor.py:2254-2287)."""
        if len(rep) == 1 and hasattr(rep[0], "__len__"):
            rep = tuple(rep[0])
        assert len(rep) >= self.dim()
        assert all(r >= 1 for r in rep)
        t = self.clone()
        if len(rep) > self.dim():
            for n in range(self.dim(), len(rep)):
                # New trailing mode as a CP factor of the trailing rank —
                # 3D (B x I x R) in batch layout, 2D otherwise
                cshape = (rep[n], t.cores[-1].shape[-1])
                if t.batch:
                    cshape = (t.cores[-1].shape[0],) + cshape
                t.cores.append(jnp.ones(cshape, dtype=t.cores[-1].dtype))
                t.Us.append(None)
                t.idxs.append(np.arange(rep[n]))
        for n in range(self.dim()):
            if t.Us[n] is not None:
                t.Us[n] = jnp.tile(t.Us[n], (1,) * (t.Us[n].ndim - 2) + (rep[n], 1))
            else:
                reps = [1] * t.cores[n].ndim
                reps[-2] = rep[n]
                t.cores[n] = jnp.tile(t.cores[n], reps)
        return t


# ----------------------------------------------------------------------
# Pytree registration: cores and Tucker factors are leaves; batch flag and
# idxs annotations are static aux data. This is what makes every op
# jit/vmap/grad-compatible.
# ----------------------------------------------------------------------
def _tensor_flatten(t: Tensor):
    children = (t.cores, t.Us)
    def _enc(i):
        if i is None:
            return None
        a = np.asarray(i)
        # Default annotations are arange(I) per mode; encode them as a tiny
        # marker instead of an O(I) tuple — aux data is hashed/compared on
        # EVERY jit dispatch involving a Tensor
        if a.ndim == 1 and a.size and a[0] == 0 and a[-1] == a.size - 1 and np.array_equal(
            a, np.arange(a.size)
        ):
            return ("arange", int(a.size))
        return tuple(a.tolist())

    idxs = tuple(_enc(i) for i in getattr(t, "idxs", []))
    aux = (t.batch, idxs, t.requires_grad, tuple(sorted(getattr(t, "frozen_Us", ()))))
    return children, aux


def _tensor_unflatten(aux, children):
    t = object.__new__(Tensor)
    t.cores = list(children[0])
    t.Us = list(children[1])
    t.batch = aux[0]
    t.idxs = [
        None if i is None
        else np.arange(i[1]) if isinstance(i, tuple) and len(i) == 2 and i[0] == "arange"
        else np.asarray(i)
        for i in aux[1]
    ]
    t.requires_grad = aux[2]
    t.frozen_Us = set(aux[3]) if len(aux) > 3 else set()
    return t


jax.tree_util.register_pytree_node(Tensor, _tensor_flatten, _tensor_unflatten)
