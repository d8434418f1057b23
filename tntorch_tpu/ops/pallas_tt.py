"""Pallas TPU kernel: fused batched TT evaluation.

`tt_batch_forward` (evaluate a TT at B integer coordinate vectors) is the
inner loop of completion / regression training and of cross-approximation
validation. In stock XLA it lowers to per-mode gathers + B tiny (1 x R x R)
batched matvecs — poor MXU utilization and an HBM round-trip per mode.

This kernel runs the whole chain in one `pallas_call`:

- the running interface v (TB x R) stays resident in VMEM across all modes;
- the per-sample slice selection C[:, X[b,k], :] is reformulated as two
  MXU matmuls on the *unfolded* core (R x I*R') plus a one-hot lane mask:
      W = v @ C_unf                       (TB x I*R')
      v' = (W * window_mask(X[:,k])) @ S  (TB x R')
  where S[l, r] = [l mod R' == r] folds the selected window back to R'
  columns — no gather instructions at all, everything is iota/compare/dot.

Cores must fit VMEM (sum of R*I*R' * 4B <= ~12MB), which holds for the
training regimes this targets (I <= 1024, R <= 64).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

try:  # Pallas requires a TPU-capable jaxlib; guard for portability
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False

TILE_B = 128  # sample tile (lane-friendly)


def _kernel(x_ref, *refs):
    core_refs = refs[:-1]
    out_ref = refs[-1]
    N = len(core_refs)
    dtype = out_ref.dtype
    TB = x_ref.shape[0]

    # First mode: v = onehot(X[:,0], I0) @ C0 (C0 enters unfolded as (I0, R1))
    c0 = core_refs[0][:]
    I0 = c0.shape[0]
    lanes = jax.lax.broadcasted_iota(jnp.int32, (TB, I0), 1)
    onehot = (lanes == x_ref[:, 0][:, None]).astype(dtype)
    v = jnp.dot(onehot, c0, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)

    for k in range(1, N):
        cu = core_refs[k][:]  # (R_k, I_k * R_{k+1})
        Rk, IR = cu.shape
        Rn = out_ref.shape[1] if k == N - 1 else core_refs[k + 1].shape[0]
        I = IR // Rn
        W = jnp.dot(v.astype(dtype), cu, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)  # (TB, I*Rn)
        lanes = jax.lax.broadcasted_iota(jnp.int32, (TB, IR), 1)
        mask = (lanes // Rn == x_ref[:, k][:, None]).astype(jnp.float32)
        Wm = W * mask
        # Fold the selected window back to Rn columns: S[l, r] = [l % Rn == r]
        lrow = jax.lax.broadcasted_iota(jnp.int32, (IR, Rn), 0)
        lcol = jax.lax.broadcasted_iota(jnp.int32, (IR, Rn), 1)
        S = (lrow % Rn == lcol).astype(dtype)
        v = jnp.dot(Wm.astype(dtype), S, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)

    # The accumulator is f32 (preferred_element_type above); cast back to
    # the output dtype — storing f32 into a non-f32 ref is a Mosaic error
    out_ref[:] = v.astype(out_ref.dtype)


def _prepare(cores):
    """Unfold cores for the kernel: first core (I0, R1); others (R, I*R')."""
    c0 = cores[0]
    prepped = [c0.reshape(c0.shape[1], c0.shape[2])]  # (1, I, R) -> (I, R)
    for c in cores[1:]:
        prepped.append(c.reshape(c.shape[0], -1))
    return prepped


@partial(jax.jit, static_argnames=("interpret",))
def pallas_tt_eval(cores, X, interpret: bool = False):
    """Evaluate a pure TT (first rank 1, last rank 1) at integer coordinates.

    :param cores: list of N cores (R_{k-1} x I_k x R_k), R_0 = R_N = 1
    :param X: (B, N) int32 coordinates; B must be a multiple of 128
    :return: (B,) values (f32)
    """
    if not HAVE_PALLAS:
        raise RuntimeError("Pallas unavailable in this jaxlib build")
    B, N = X.shape
    assert B % TILE_B == 0, f"B must be a multiple of {TILE_B}"
    prepped = _prepare(list(cores))
    dtype = prepped[0].dtype

    grid = (B // TILE_B,)
    in_specs = [pl.BlockSpec((TILE_B, N), lambda i: (i, 0), memory_space=pltpu.VMEM)]
    for p in prepped:
        in_specs.append(
            pl.BlockSpec(p.shape, lambda i, nd=p.ndim: (0,) * nd, memory_space=pltpu.VMEM)
        )
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((TILE_B, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1), dtype),
        interpret=interpret,
    )(X.astype(jnp.int32), *prepped)
    return out[:, 0]


def tt_eval(cores, X, use_pallas: Optional[bool] = None):
    """Batched TT evaluation with automatic kernel selection: the fused
    Pallas chain on TPU when shapes allow, XLA gather chain otherwise."""
    from tntorch_tpu.parallel.mesh import tt_batch_forward

    B = X.shape[0]
    if use_pallas is None:
        itemsize = cores[0].dtype.itemsize
        vmem_bytes = sum(int(np.prod(c.shape)) * c.dtype.itemsize for c in cores)
        # The kernel also materializes, per mode k: W/lanes/mask/Wm tiles of
        # (TILE_B x I_k*R_{k+1}) and the fold matrix S + its iotas of
        # (I_k*R_{k+1} x R_{k+1}) — that scratch, not the summed core
        # bytes, is what overflows scoped VMEM at large I*R (conservative:
        # falling back to the XLA chain is always correct)
        scratch = max(
            (4 * TILE_B + 3 * c.shape[-1]) * c.shape[-2] * c.shape[-1] * itemsize
            for c in cores
        )
        use_pallas = (
            HAVE_PALLAS
            and jax.default_backend() == "tpu"
            and B % TILE_B == 0
            and cores[0].shape[0] == 1
            and cores[-1].shape[-1] == 1
            and cores[0].dtype == jnp.float32
            # Everything must stay VMEM-resident (module docstring budget)
            and vmem_bytes + scratch <= 12 * 2**20
        )
    if use_pallas:
        return pallas_tt_eval(tuple(cores), X)
    return tt_batch_forward(list(cores), X)
