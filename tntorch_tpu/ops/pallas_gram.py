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
# The weighted-Gram kernel (W product + two layout casts live at once):
# Mosaic measured 19.45M where the 6-copy model said 12.6M
_COPIES_WGRAM = 10


def _pick_tile(Rl, I, Rr, copies=None):
    """Largest power-of-two tile <= _TILE_I that divides I and fits VMEM.

    ``copies`` models Mosaic's scoped-VMEM footprint in tile-sized buffers;
    the weighted-Gram kernel carries more live copies (the W product and
    both layout casts) than the plain Gram edge — measured 19.45M at a
    tile the 6-copy model priced at 12.6M — so it passes a larger factor.
    """
    if copies is None:
        copies = _COPIES
    tile = _TILE_I
    while tile > 1 and (I % tile or copies * Rl * tile * Rr * 4 > _VMEM_BUDGET):
        tile //= 2
    if I % tile or copies * Rl * tile * Rr * 4 > _VMEM_BUDGET:
        return 0
    if tile < 8 and tile != I:
        # Pallas TPU requires the sublane (second-to-last) block dim be a
        # multiple of 8 or the full axis: a shape that only fits VMEM at
        # tile < 8 is unsupported (callers fall back to the einsum path)
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


def _wgram_kernel(c_ref, w_ref, out_ref, *, mm_precision):
    """One (batch, i-tile) step of the LEFT (prefix-weighted) Gram:
    out[b, d] += sum_{a, a', i} C[a, i, b] W[a, a'] C[a', i, d]."""
    i_step = pl.program_id(1)

    C = c_ref[0]  # (Rl, TILE_I, Rr)
    W = w_ref[0]  # (Rl, Rl)
    Rl, TI, Rr = C.shape
    # T[a, i*Rr] = sum_{a'} W[a, a'] C[a', i*Rr]: i rides the flattened minor
    T = jnp.dot(
        W, C.reshape(Rl, TI * Rr),
        preferred_element_type=jnp.float32,
        precision=mm_precision,
    )
    # out[b, d] += sum_{(a,i)} C[(a,i), b] T[(a,i), d]
    acc = jax.lax.dot_general(
        C.reshape(Rl * TI, Rr), T.reshape(Rl * TI, Rr),
        (((0,), (0,)), ((), ())),
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
def pallas_wgram(C, W, interpret: bool = False, precision: str = "highest"):
    """Batched prefix-weighted left Gram: (B, Rl, I, Rr), (B, Rl, Rl) ->
    (B, Rr, Rr), equal to ``einsum('zaib,zad,zdic->zbc', C, W, C)`` with f32
    accumulation and one HBM read of C (the W-multiplied tile never exists
    in HBM).

    This is the Gram of the *pushed* core Y @ C with W = Y^T Y — the
    no-push batched rounding sweep (ops/rounding.py) uses it so the pushed
    core is never materialized. With W the identity it is the plain
    left-unfolding Gram (first edge).
    """
    if not HAVE_PALLAS:
        raise RuntimeError("Pallas unavailable in this jaxlib build")
    B, Rl, I, Rr = C.shape
    tile = _pick_tile(Rl, I, Rr, copies=_COPIES_WGRAM)
    assert tile, "unsupported shape (check wgram_supported first)"
    grid = (B, I // tile)
    return pl.pallas_call(
        partial(_wgram_kernel, mm_precision=_PRECISIONS[precision]),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, Rl, tile, Rr), lambda b, i: (b, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Rl, Rl), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Rr, Rr), lambda b, i: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Rr, Rr), C.dtype),
        interpret=interpret,
    )(C, W)


def wgram_supported(C) -> bool:
    """Shape/dtype gate for the fused weighted left Gram: same layout rules
    as the right-Gram edge (the kernel reshapes (Rl, TI*Rr) <-> (Rl*TI, Rr)
    in VMEM, so the lane dim Rr must be 128-aligned), plus Rl lane-aligned
    for the W GEMM."""
    if not HAVE_PALLAS or C.dtype != jnp.float32 or C.ndim != 4:
        return False
    B, Rl, I, Rr = C.shape
    return (Rl % 8 == 0 and Rr % 128 == 0
            and _pick_tile(Rl, I, Rr, copies=_COPIES_WGRAM) > 0)


def _proj2_kernel(y_ref, c_ref, x_ref, out_ref, *, mm_precision):
    """One (batch, i-tile) step of the double-sided projection:
    out[r, i, c] = sum_{a, b} Y[r, a] C[a, i, b] X[b, c]."""
    Y = y_ref[0]  # (r1, Rl)
    C = c_ref[0]  # (Rl, TILE_I, Rr)
    X = x_ref[0]  # (Rr, r2p)
    Rl, TI, Rr = C.shape
    r1 = Y.shape[0]
    T = jnp.dot(
        Y, C.reshape(Rl, TI * Rr),
        preferred_element_type=jnp.float32,
        precision=mm_precision,
    )  # (r1, TI*Rr)
    out = jnp.dot(
        T.reshape(r1 * TI, Rr), X,
        preferred_element_type=jnp.float32,
        precision=mm_precision,
    )  # (r1*TI, r2p)
    out_ref[0] = out.reshape(r1, TI, X.shape[1]).astype(out_ref.dtype)


@partial(jax.jit, static_argnames=("interpret", "precision"))
def pallas_proj2(Y, C, X, interpret: bool = False, precision: str = "highest"):
    """Batched double-sided projection: (B, r1, Rl), (B, Rl, I, Rr),
    (B, Rr, r2) -> (B, r1, I, r2), equal to
    ``einsum('zra,zaib,zbc->zric', Y, C, X)`` reading C from HBM exactly
    once and never materializing the (B, r1, I, Rr) half-projected
    intermediate (the push-based sweep writes it out in full).

    r2 is zero-padded to a 128 lane multiple for the in-VMEM reshape and
    sliced back after — the padded write is still ~2x cheaper than the
    push + project pair it replaces.
    """
    if not HAVE_PALLAS:
        raise RuntimeError("Pallas unavailable in this jaxlib build")
    B, Rl, I, Rr = C.shape
    r1 = Y.shape[1]
    r2 = X.shape[2]
    r2p = -(-r2 // 128) * 128
    if r2p != r2:
        X = jnp.concatenate(
            [X, jnp.zeros((B, Rr, r2p - r2), dtype=X.dtype)], axis=-1
        )
    tile = _pick_tile(max(Rl, r1), I, max(Rr, r2p))
    assert tile, "unsupported shape (check proj2_supported first)"
    grid = (B, I // tile)
    out = pl.pallas_call(
        partial(_proj2_kernel, mm_precision=_PRECISIONS[precision]),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, r1, Rl), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Rl, tile, Rr), lambda b, i: (b, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Rr, r2p), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, r1, tile, r2p), lambda b, i: (b, 0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, r1, I, r2p), C.dtype),
        interpret=interpret,
    )(Y, C, X)
    return out[..., :r2] if r2p != r2 else out


def proj2_supported(Y, C, X) -> bool:
    """Gate for the fused double-sided projection: f32, the kernel's two
    VMEM reshapes need Rr 128-aligned and r1/Rl sublane-aligned."""
    if not HAVE_PALLAS or C.dtype != jnp.float32 or C.ndim != 4:
        return False
    B, Rl, I, Rr = C.shape
    r1 = Y.shape[1]
    return (
        Y.dtype == jnp.float32 and X.dtype == jnp.float32
        and r1 % 8 == 0 and Rl % 8 == 0 and Rr % 128 == 0
        and _pick_tile(max(Rl, r1), I, max(Rr, -(-X.shape[2] // 128) * 128)) > 0
    )


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
