"""Pallas TPU kernel: fused Gram-chain edge for batched TT rounding.

The right-Gram recursion of `ops.rounding._round_tt_gram_body`,

    T = einsum("aib,bc->aic", C, G)      # (Rl, I, Rr) x (Rr, Rr)
    G' = einsum("aic,dic->ad", T, C)     # -> (Rl, Rl)

is two GEMMs on contiguous reshapes — XLA already maps them onto the MXU,
but it materializes the 16 MB intermediate T in HBM between them. Measured
at B=32, N=4, I=256, R=128 the batched chain is ~70% of the whole rounding
sweep and memory-bound (switching matmul precision barely moves it).

This kernel tiles over the mode index i and keeps each T tile in VMEM:
per (batch, i-tile) step it loads one C tile, runs both GEMMs back to
back, and accumulates G' across i-tiles in the output block — C is read
from HBM exactly once and T never exists in HBM, cutting the edge's
traffic ~3x.

Used by the batched rounding path on TPU for f32 cores when shapes allow
(Rl, Rr multiples of 8; I divisible by the tile); everything else falls
back to the einsum pair.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

try:  # pragma: no cover - availability guard
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False

_TILE_I = 16  # mode-index tile: T tile = (Rl, TILE_I * Rr) stays in VMEM
# (measured at B=32, R=128, I=256: tile 16 = 4.30 ms vs 4.52 at 32; >=64
# exceeds VMEM)

# Mosaic's scoped-VMEM footprint is ~6 tile-sized buffers (C tile, T, the
# layout-cast copies, accumulator): a 256x16x256 f32 tile was rejected at
# 26.08M against the 16M limit, 128x16x128 compiled at ~6.5M
_VMEM_BUDGET = 14 * 2**20
_COPIES = 6


def _pick_tile(Rl, I, Rr):
    """Largest power-of-two tile <= _TILE_I that divides I and fits VMEM."""
    tile = _TILE_I
    while tile > 1 and (I % tile or _COPIES * Rl * tile * Rr * 4 > _VMEM_BUDGET):
        tile //= 2
    if I % tile or _COPIES * Rl * tile * Rr * 4 > _VMEM_BUDGET:
        return 0
    return tile


_PRECISIONS = {
    "highest": None,  # filled below (jax.lax enums)
    "high": None,
    "default": None,
}
if HAVE_PALLAS:
    _PRECISIONS = {
        "highest": jax.lax.Precision.HIGHEST,
        # Mosaic's dot lowering accepts only HIGHEST/DEFAULT ("Unsupported
        # dot precision: HIGH"); map 'high' to the exact passes — the fused
        # chain is memory-bound, so the extra MXU passes are hidden
        "high": jax.lax.Precision.HIGHEST,
        "default": jax.lax.Precision.DEFAULT,
    }


def _gram_edge_kernel(c_ref, g_ref, out_ref, *, mm_precision):
    """One (batch, i-tile) step: out += (C_tile @ G) . C_tile."""
    i_step = pl.program_id(1)

    C = c_ref[0]  # (Rl, TILE_I, Rr)
    G = g_ref[0]  # (Rr, Rr)
    Rl, TI, Rr = C.shape
    # T[a, i, c] = sum_b C[a, i, b] G[b, c]: G-multiply is i-independent, so
    # one GEMM on the (Rl*TI, Rr) reshape; stays in VMEM
    T = jnp.dot(
        C.reshape(Rl * TI, Rr), G,
        preferred_element_type=jnp.float32,
        precision=mm_precision,
    )
    # out[a, d] += sum_{i,c} T[a, i, c] C[d, i, c]
    acc = jax.lax.dot_general(
        T.reshape(Rl, TI * Rr), C.reshape(Rl, TI * Rr),
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=mm_precision,
    )

    @pl.when(i_step == 0)
    def _init():
        out_ref[0] = acc.astype(out_ref.dtype)

    @pl.when(i_step > 0)
    def _acc():
        out_ref[0] += acc.astype(out_ref.dtype)


@partial(jax.jit, static_argnames=("interpret", "precision"))
def pallas_gram_edge(C, G, interpret: bool = False, precision: str = "highest"):
    """Batched fused Gram edge: (B, Rl, I, Rr), (B, Rr, Rr) -> (B, Rl, Rl).

    Equivalent to ``einsum('...aic,...dic->...ad', einsum('...aib,...bc->...aic',
    C, G), C)`` with f32 accumulation, without materializing T in HBM.
    `precision` sets the MXU pass count of both in-VMEM GEMMs (the policy's
    matmul precision; accumulation stays f32 regardless).
    """
    if not HAVE_PALLAS:
        raise RuntimeError("Pallas unavailable in this jaxlib build")
    B, Rl, I, Rr = C.shape
    tile = _pick_tile(Rl, I, Rr)
    assert tile, "unsupported shape (check gram_edge_supported first)"
    grid = (B, I // tile)
    return pl.pallas_call(
        partial(_gram_edge_kernel, mm_precision=_PRECISIONS[precision]),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, Rl, tile, Rr), lambda b, i: (b, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Rr, Rr), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Rl, Rl), lambda b, i: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Rl, Rl), C.dtype),
        interpret=interpret,
    )(C, G)


def gram_edge_supported(C) -> bool:
    """Shape/dtype gate for the fused kernel: f32, lane-aligned ranks, and
    a C tile + T tile that fit the VMEM budget.

    The kernels reshape between (Rl*TI, Rr) and (Rl, TI*Rr) layouts in
    VMEM; Mosaic only supports that shape cast when the minor (lane)
    dimension is a multiple of 128 on both sides, so Rr must be
    128-aligned (verified: Rr=128 compiles, Rr=16 fails with
    'unsupported shape cast')."""
    if not HAVE_PALLAS or C.dtype != jnp.float32 or C.ndim != 4:
        return False
    B, Rl, I, Rr = C.shape
    return Rl % 8 == 0 and Rr % 128 == 0 and _pick_tile(Rl, I, Rr) > 0
