"""Fully-fused Pallas TPU kernel for the column-calling step: quality
merge + base filters + alt counts + Poisson-binomial screening DP in ONE
pass over a packed int32 stream (VERDICT r1 #5: the unfused XLA path made
~12 HBM passes over the [B, D] tile).

Input packing (4 B/base instead of 11 B across five arrays):
    bits  0-6   bq   (0..93; 127 = invalid/missing row)
    bits  7-13  baq  (stored +1: 0 = missing)
    bits 14-20  mq   (stored +1 and clamped to 125: 0 = missing; 255 in
                      the BAM maps to missing per snpcaller.c:302)
    bits 21-27  sq   (stored +1 and clamped to 125: 0 = missing)
    bits 28-30  nt4  (0-3 ACGT, 4 N)
The mq/sq clamp adds at most 10^-12.5 of absolute error prob per read —
orders of magnitude inside the screen's MARGIN slack.

DP: the kernel keeps the FULL linear-space distribution P(X = j) for
j = 0..KMAX plus an overflow cell P(X > KMAX), so the tail cell K (max
alt count) does not need to be known up front — that is what lets counts
and DP share one pass.  tail(K) = sum_{j>=K} P(X=j) + overflow is a pure
positive sum (no 1-cumsum cancellation); f32 underflow only shrinks it,
which only ADDS candidates — the conservative direction (the exact host
DP confirms all candidates, snpcaller.c:830).

Grid = (column tiles, depth chunks), depth minor: DP state + count
accumulators live in VMEM scratch across chunks while packed blocks
stream HBM->VMEM under double buffering.
"""

from __future__ import annotations

import numpy as np

from .. import defaults as D

KMAX = 16
NROWS = 24          # 0..16 cells, 17 overflow, 18..23 zero padding
TILE_B = 1024
CHUNK_D = 32
LN10_10 = float(np.log(10.0) / 10.0)
MQ0_ERRPROB = D.MQ0_ERRPROB
INVALID_BQ = 127


def pack_columns_np(nt4, bq, baq, mq, sq, valid):
    """Host-side packer: [B, D] field arrays -> [D, B] packed int32."""
    bq_f = np.where(valid & (bq >= 0), np.minimum(bq, 93), INVALID_BQ)
    baq_f = np.where(baq < 0, 0, np.minimum(baq, 93) + 1)
    mq_f = np.where((mq < 0) | (mq == 255), 0, np.minimum(mq, 125) + 1)
    sq_f = np.where(sq < 0, 0, np.minimum(sq, 125) + 1)
    packed = (bq_f.astype(np.int32)
              | (baq_f.astype(np.int32) << 7)
              | (mq_f.astype(np.int32) << 14)
              | (sq_f.astype(np.int32) << 21)
              | (np.minimum(nt4, 4).astype(np.int32) << 28))
    return np.ascontiguousarray(packed.T)


def _build_kernel(d, tile_b, min_bq, min_alt_bq, use_baq, use_mq, use_sq):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_chunks = d // CHUNK_D

    def kernel(packed_ref, ref_ref, tail_ref, depth_ref, acnt_ref,
               araw_ref, state_ref, acnt_s, araw_s, depth_s):
        j = pl.program_id(1)
        rows = jax.lax.broadcasted_iota(jnp.int32, (NROWS, tile_b), 0)
        rows8 = jax.lax.broadcasted_iota(jnp.int32, (8, tile_b), 0)
        ref = ref_ref[0, :]

        @pl.when(j == 0)
        def _():
            state_ref[...] = jnp.where(rows == 0, 1.0, 0.0).astype(
                jnp.float32)
            acnt_s[...] = jnp.zeros((8, tile_b), jnp.float32)
            araw_s[...] = jnp.zeros((8, tile_b), jnp.float32)
            depth_s[...] = jnp.zeros((8, tile_b), jnp.float32)

        blk = packed_ref[...]                       # [CHUNK_D, T] i32
        bq = blk & 0x7F
        baq = ((blk >> 7) & 0x7F) - 1
        mq = ((blk >> 14) & 0x7F) - 1
        sq = ((blk >> 21) & 0x7F) - 1
        nt4 = (blk >> 28) & 0x7

        not_n = (bq != INVALID_BQ) & (nt4 != 4)
        is_alt = not_n & (nt4 != ref[None, :])
        keep = not_n & (bq >= min_bq) & (~is_alt | (bq >= min_alt_bq))

        def q2p(q, use):
            if not use:
                return jnp.zeros_like(q, jnp.float32)
            return jnp.where(
                q < 0, 0.0,
                jnp.exp(q.astype(jnp.float32) * jnp.float32(-LN10_10)))

        sp = q2p(sq, use_sq)
        mp = q2p(mq, use_mq)
        if use_mq:
            mp = jnp.where(mq == 0, jnp.float32(MQ0_ERRPROB), mp)
        bap = q2p(baq, use_baq)
        bp = q2p(bq, True)
        merged = (mp + (1 - mp) * sp + (1 - mp) * (1 - sp) * bap
                  + (1 - mp) * (1 - sp) * (1 - bap) * bp)
        p_all = jnp.where(keep, jnp.clip(merged, 0.0, 1.0), 0.0)

        # count accumulation: per-base-id kept-alt / raw-alt sums
        kf = (keep & is_alt).astype(jnp.float32)
        rf = is_alt.astype(jnp.float32)
        acnt = acnt_s[...]
        araw = araw_s[...]
        for b in range(4):                          # ids 0..3 (ACGT)
            sel = (nt4 == b).astype(jnp.float32)
            row_b = (rows8 == b).astype(jnp.float32)
            acnt = acnt + row_b * jnp.sum(kf * sel, axis=0)[None, :]
            araw = araw + row_b * jnp.sum(rf * sel, axis=0)[None, :]
        acnt_s[...] = acnt
        araw_s[...] = araw
        depth_s[...] = depth_s[...] + (rows8 == 0).astype(jnp.float32) * \
            jnp.sum(keep.astype(jnp.float32), axis=0)[None, :]

        # DP over the chunk's rows (static unroll)
        state = state_ref[...]
        in_cells = (rows <= 17).astype(jnp.float32)
        keep_decay = (rows != 17).astype(jnp.float32)
        for r in range(CHUNK_D):
            p = p_all[r][None, :]
            shifted = pltpu.roll(state, 1, axis=0)
            shifted = jnp.where(rows == 0, 0.0, shifted)
            decay = 1.0 - p * keep_decay  # overflow row never decays
            state = (state * decay + shifted * p) * in_cells
        state_ref[...] = state

        @pl.when(j == n_chunks - 1)
        def _():
            # ks = max kept-alt count over the non-ref ACGT ids
            alt_mask = (rows8 < 4) & (rows8 != ref[None, :])
            ks = jnp.max(jnp.where(alt_mask, acnt_s[...], 0.0), axis=0)
            kc = jnp.clip(ks, 1.0, float(KMAX))
            tail_sel = ((rows.astype(jnp.float32) >= kc[None, :])
                        & (rows <= 16)) | (rows == 17)
            lin = jnp.sum(jnp.where(tail_sel, state_ref[...], 0.0),
                          axis=0)
            tail_ref[0, :] = jnp.log(jnp.maximum(lin, 1e-37))
            depth_ref[0, :] = depth_s[0, :]
            acnt_ref[...] = acnt_s[...]
            araw_ref[...] = araw_s[...]

    interpret = None

    def run(packed_t, ref_nt4):
        import jax

        nonlocal interpret
        if interpret is None:
            interpret = jax.default_backend() == "cpu"
        B = packed_t.shape[1]
        grid = (B // tile_b, n_chunks)
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((CHUNK_D, tile_b),
                             lambda i, j: (j, i)),
                pl.BlockSpec((1, tile_b), lambda i, j: (0, i)),
            ],
            out_specs=[
                pl.BlockSpec((1, tile_b), lambda i, j: (0, i)),
                pl.BlockSpec((1, tile_b), lambda i, j: (0, i)),
                pl.BlockSpec((8, tile_b), lambda i, j: (0, i)),
                pl.BlockSpec((8, tile_b), lambda i, j: (0, i)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((1, B), jnp.float32),
                jax.ShapeDtypeStruct((1, B), jnp.float32),
                jax.ShapeDtypeStruct((8, B), jnp.float32),
                jax.ShapeDtypeStruct((8, B), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((NROWS, tile_b), jnp.float32),
                pltpu.VMEM((8, tile_b), jnp.float32),
                pltpu.VMEM((8, tile_b), jnp.float32),
                pltpu.VMEM((8, tile_b), jnp.float32),
            ],
            interpret=interpret,
        )(packed_t, ref_nt4[None, :].astype(jnp.int32))
        return out

    import jax.numpy as jnp

    return run


def build_fused_column_call(min_bq=D.DEFAULT_MIN_BQ,
                            min_alt_bq=D.DEFAULT_MIN_ALT_BQ,
                            sig=D.DEFAULT_SIG,
                            use_baq=True, use_mq=True, use_sq=False,
                            tile_b=TILE_B):
    """Returns a jittable fn(packed_t [D, B] i32, ref_nt4 [B],
    bonf_base [B]) -> the build_column_call output dict, computed in one
    fused HBM pass.  D must be a multiple of CHUNK_D and B of tile_b."""
    import jax
    import jax.numpy as jnp

    from .screen import MARGIN

    kern = None

    def fused(packed_t, ref_nt4, bonf_base):
        nonlocal kern
        Dd, B = packed_t.shape
        if kern is None:
            kern = _build_kernel(Dd, tile_b, min_bq, min_alt_bq,
                                 use_baq, use_mq, use_sq)
        tail, depth, acnt8, araw8 = kern(packed_t, ref_nt4)
        tail_val = tail[0]
        depths = depth[0].astype(jnp.int32)
        acnt5 = acnt8[:5].T.astype(jnp.int32)      # [B, 5]
        araw5 = araw8[:5].T.astype(jnp.int32)

        base_ids = jnp.arange(4)[None, :]
        alt_sel = base_ids != ref_nt4[:, None]
        alt_nt = jnp.argsort(~alt_sel, axis=1, stable=True)[:, :3]
        alt_counts = jnp.take_along_axis(acnt5[:, :4], alt_nt, axis=1)
        alt_raw = jnp.take_along_axis(araw5[:, :4], alt_nt, axis=1)
        ks = jnp.max(alt_counts, axis=1)
        tested = (ref_nt4 != 4) & (depths >= 0) & (ks > 0)
        log_thresh = jnp.log(jnp.float32(sig * MARGIN)) - jnp.log(
            jnp.maximum(bonf_base.astype(jnp.float32), 1.0))
        candidate = tested & ((tail_val < log_thresh) | (ks > KMAX))
        return dict(
            alt_counts=alt_counts, alt_raw=alt_raw, alt_nt=alt_nt,
            depths=depths, tested=tested, candidate=candidate,
            screen_tail=tail_val,
            num_tested=jnp.sum(tested.astype(jnp.int32)),
        )

    return fused
