"""Pallas TPU kernel for the Poisson-binomial screening DP.

Computes, per pileup column, the log tail probability P(X >= K) of the
number of error reads (X = sum Bernoulli(p_i)) in LINEAR f32 space (pure
multiply-add per step; a p=0 read is an exact identity update, and f32
underflow only shrinks the tail = only adds candidates, the conservative
direction), K clipped to KMAX.  Because the Poisson-binomial distribution
is permutation invariant, the kernel streams the *unsorted* masked error
probs — no device-side sort needed (the exact host DP sorts for
bit-identity; the screen doesn't care).  Pad/invalid entries are encoded
as 2.0 and mapped to the p=0 identity in-kernel.

Structure: grid = (column tiles, depth chunks); the depth-chunk axis is the
minor (sequential) grid dimension, so the [NROWS, TILE_B] DP state lives in
VMEM scratch and persists across chunks while the probs blocks stream
HBM->VMEM under double buffering.  Each chunk's 32 rows are processed with
*static* row indices (dynamic sublane reads lower poorly on Mosaic).
At B=32768 x D=2000 the linear-space kernel runs in ~2.8 ms on a v5e chip
— 3x the XLA lax.scan formulation (8.4 ms), ~8x off the raw HBM floor.
"""

from __future__ import annotations

import functools

import numpy as np

KMAX = 16
NROWS = 24  # KMAX+1 padded to a sublane multiple
NEG = -1e30
TILE_B = 1024
CHUNK_D = 32


def _build(d, tile_b=TILE_B):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_chunks = d // CHUNK_D

    def kernel(probs_ref, kc_ref, out_ref, state_ref):
        j = pl.program_id(1)
        rows = jax.lax.broadcasted_iota(jnp.int32, (NROWS, tile_b), 0)
        kc = kc_ref[0, :]
        is_tail = (rows == kc[None, :]).astype(jnp.float32)
        not_beyond = (rows <= kc[None, :]).astype(jnp.float32)

        @pl.when(j == 0)
        def _():
            state_ref[...] = jnp.where(rows == 0, 1.0, 0.0).astype(
                jnp.float32)

        state = state_ref[...]
        for r in range(CHUNK_D):  # static unroll: static sublane reads
            p = probs_ref[r, :]
            p = jnp.where(p > 1.5, 0.0, p)  # pad/invalid -> identity
            p = jnp.clip(p, 0.0, 1.0)[None, :]
            shifted = pltpu.roll(state, 1, axis=0)
            shifted = jnp.where(rows == 0, 0.0, shifted)
            adv = shifted * p
            std = state * (1.0 - p) + adv
            tail = state + adv
            state = (is_tail * tail + (1.0 - is_tail) * std) * not_beyond
        state_ref[...] = state

        @pl.when(j == n_chunks - 1)
        def _():
            lin = jnp.max(jnp.where(is_tail > 0.0, state, 0.0), axis=0)
            out_ref[0, :] = jnp.log(jnp.maximum(lin, 1e-37))

    interpret = jax.default_backend() == "cpu"  # tests on the CPU mesh

    @jax.jit
    def run(probs_t, kc):
        B = probs_t.shape[1]
        grid = (B // tile_b, n_chunks)
        return pl.pallas_call(
            kernel,
            interpret=interpret,
            grid=grid,
            in_specs=[
                pl.BlockSpec((CHUNK_D, tile_b), lambda i, j: (j, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile_b), lambda i, j: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, tile_b), lambda i, j: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, B), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((NROWS, tile_b), jnp.float32),
            ],
        )(probs_t, kc)

    return run


@functools.lru_cache(maxsize=32)
def _get(d, tile_b):
    return _build(d, tile_b)


def poissbin_tail_pallas(probs, valid, ks):
    """probs [B, D] f32 (any order), valid [B, D] bool, ks [B] int.
    Returns log tail [B] f32 at cell min(ks, KMAX)."""
    import jax.numpy as jnp

    B, D = probs.shape
    probs = np.where(valid, probs, 2.0).astype(np.float32)
    tile_b = min(TILE_B, max(128, 1 << int(np.ceil(np.log2(max(B, 1))))))
    padB = -(-B // tile_b) * tile_b
    padD = -(-D // CHUNK_D) * CHUNK_D
    if padB != B or padD != D:
        probs = np.pad(probs, ((0, padB - B), (0, padD - D)),
                       constant_values=2.0)
        ks = np.pad(ks, (0, padB - B), constant_values=1)
    run = _get(padD, tile_b)
    out = run(
        jnp.asarray(np.ascontiguousarray(probs.T)),
        jnp.asarray(np.clip(ks, 1, KMAX)[None, :].astype(np.int32)),
    )
    return np.asarray(out)[0, :B]


def tail_device(probs, kc, tile_b=None):
    """jit-composable device entry: probs [B, D] f32 (0.0 or 2.0 = skip),
    kc [B] int (already clipped to [1, KMAX]).  Returns log-tail [B] f32.
    Pads B to the tile and D to the chunk internally."""
    import jax.numpy as jnp

    B, D = probs.shape
    tb = tile_b or (TILE_B if B >= TILE_B else max(128, -(-B // 128) * 128))
    padB = -(-B // tb) * tb
    padD = -(-D // CHUNK_D) * CHUNK_D
    if padD != D or padB != B:
        probs = jnp.pad(probs, ((0, padB - B), (0, padD - D)),
                        constant_values=2.0)
        kc = jnp.pad(kc, (0, padB - B), constant_values=1)
    run = _get(padD, tb)
    out = run(probs.T, kc[None, :].astype(jnp.int32))
    return out[0, :B]
