"""Fused Pallas column step (ops/pallas_fused_call.py) vs the unfused XLA
pipeline (ops/device_call.py): identical counts/depths, equal-or-more
candidates (both conservative screens over the same exact host DP)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")


@pytest.fixture(scope="module", autouse=True)
def _cpu():
    import jax

    jax.config.update("jax_platforms", "cpu")


def _batch(B, Dd, seed=0, depth_frac=1.0):
    rng = np.random.default_rng(seed)
    ref_nt4 = rng.integers(0, 4, B).astype(np.int8)
    nt4 = np.where(rng.random((B, Dd)) < 0.99, ref_nt4[:, None],
                   rng.integers(0, 5, (B, Dd))).astype(np.int8)
    bq = rng.integers(2, 41, (B, Dd)).astype(np.int16)
    baq = np.where(rng.random((B, Dd)) < 0.1, -1,
                   rng.integers(20, 60, (B, Dd))).astype(np.int16)
    mq = rng.choice(np.array([0, 20, 60, 255], np.int16), (B, Dd),
                    p=[0.01, 0.04, 0.9, 0.05])
    sq = np.full((B, Dd), -1, np.int16)
    valid = rng.random((B, Dd)) < depth_frac
    bonf = np.full(B, 3000.0, np.float32)
    return nt4, bq, baq, mq, sq, valid, ref_nt4, bonf


def test_fused_matches_unfused_counts_and_screens():
    from lofreq_tpu.ops.device_call import build_column_call
    from lofreq_tpu.ops.pallas_fused_call import (build_fused_column_call,
                                                  pack_columns_np)

    B, Dd = 2048, 64
    nt4, bq, baq, mq, sq, valid, ref_nt4, bonf = _batch(B, Dd, seed=3,
                                                        depth_frac=0.9)
    ref_fn = jax.jit(build_column_call(use_baq=True))
    want = ref_fn(nt4, bq, baq, mq, sq, valid, ref_nt4, bonf)

    packed = pack_columns_np(nt4, bq, baq, mq, sq, valid)
    fused = build_fused_column_call(use_baq=True)
    got = fused(packed, ref_nt4.astype(np.int32), bonf)

    np.testing.assert_array_equal(np.asarray(got["depths"]),
                                  np.asarray(want["depths"]))
    np.testing.assert_array_equal(np.asarray(got["alt_counts"]),
                                  np.asarray(want["alt_counts"]))
    np.testing.assert_array_equal(np.asarray(got["alt_raw"]),
                                  np.asarray(want["alt_raw"]))
    np.testing.assert_array_equal(np.asarray(got["alt_nt"]),
                                  np.asarray(want["alt_nt"]))
    np.testing.assert_array_equal(np.asarray(got["tested"]),
                                  np.asarray(want["tested"]))
    assert int(got["num_tested"]) == int(want["num_tested"])
    # both tails bound the same quantity; they should agree closely
    t_g = np.asarray(got["screen_tail"])
    t_w = np.asarray(want["screen_tail"])
    m = np.asarray(want["tested"]) & (t_w > -80) & (t_g > -80)
    assert np.allclose(t_g[m], t_w[m], atol=1e-2, rtol=1e-3)


def test_fused_screen_is_conservative_vs_exact():
    """Every exactly-significant column must be a fused-screen candidate
    (the contract that makes screen discards safe)."""
    from lofreq_tpu.core.poissbin import snpcaller_batch
    from lofreq_tpu.core.quals import merge_srcq_mapq_baq_and_bq
    from lofreq_tpu.ops.pallas_fused_call import (build_fused_column_call,
                                                  pack_columns_np)

    B, Dd = 1024, 96
    nt4, bq, baq, mq, sq, valid, ref_nt4, bonf = _batch(B, Dd, seed=11)
    # plant unambiguous variants (high-qual alt runs) in some columns
    rng = np.random.default_rng(99)
    for c in rng.integers(0, B, 40):
        alt = (ref_nt4[c] + 1) % 4
        k = rng.integers(5, 15)
        nt4[c, :k] = alt
        bq[c, :k] = 40
        baq[c, :k] = 50
        mq[c, :k] = 60
        valid[c, :k] = True
    packed = pack_columns_np(nt4, bq, baq, mq, sq, valid)
    fused = build_fused_column_call(use_baq=True)
    out = fused(packed, ref_nt4.astype(np.int32), bonf)
    cand = np.asarray(out["candidate"])
    depths = np.asarray(out["depths"])
    alt_counts = np.asarray(out["alt_counts"])

    # exact host path over the same kept reads
    sig = 0.01
    n_sig = 0
    for c in range(B):
        not_n = valid[c] & (nt4[c] != 4)
        is_alt = not_n & (nt4[c] != ref_nt4[c])
        keep = not_n & (bq[c] >= 6)
        if not keep.any() or alt_counts[c].max() == 0 or ref_nt4[c] == 4:
            continue
        mq_eff = np.where(mq[c] == 255, -1, mq[c])
        merged = merge_srcq_mapq_baq_and_bq(
            sq[c].astype(np.int64), mq_eff.astype(np.int64),
            baq[c].astype(np.int64), bq[c].astype(np.int64))
        probs = np.sort(merged[keep])
        counts = np.zeros((1, 3), dtype=np.int64)
        counts[0] = alt_counts[c]
        pv = snpcaller_batch(probs[None, :], np.array([int(depths[c])]),
                             counts, np.array([float(bonf[c])]), sig)
        if (pv[0] * bonf[c] < sig).any():
            n_sig += 1
            assert cand[c], f"exactly-significant column {c} screened out"
    assert n_sig > 0
    assert cand.sum() < B  # and the screen actually screens
