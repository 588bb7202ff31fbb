"""Adversarial property test for the top-k prescreen's 0.5 safety
factor (docs/PARITY.md "Prescreen safety-factor error bound").

Claim: whenever `_topk_prescreen` (or the code-native
`prescreen_codes`) discards a column, the exact DP's p-value at that
column satisfies pv * bonf >= sig — i.e. the reference's emission gate
(pv * bonf < sig, lofreq_call.c:820-838) would not have emitted it, so
the discard is output-invisible.

Pools are constructed adversarially AT the discard boundary: the top-k
product is placed within e^±delta of sig * 2 / bonf for delta from
1e-7 to 0.7, with k swept to the 64-term maximum (worst f64/f32
accumulation), equal-probability ties (worst sort degeneracy), and
both f64 and f32 (screening-pack) storage.
"""

import numpy as np
import pytest

from lofreq_tpu.call.caller import _TOPK_MAX, _topk_prescreen
from lofreq_tpu.core.poissbin import pruned_prob_dist_batch, _exp_longdouble
from lofreq_tpu.ops.screen import prescreen_codes, screen_codes_for

SIG = float(np.float32(0.01))


def exact_pv(probs_row, depth, k, bonf):
    """Exact longdouble Poisson-binomial tail P(X >= k) at this column
    (the native DP used by the production exact path).  May be early-
    exited (LDBL_MAX-like huge) when provably insignificant at bonf —
    either way comparable against sig/bonf."""
    probs = np.full((1, len(probs_row)), 2.0)
    probs[0, :depth] = np.sort(probs_row[:depth])
    state, _ = pruned_prob_dist_batch(
        probs, np.array([depth]), np.array([k]),
        np.array([float(bonf)]), SIG)
    return float(_exp_longdouble(state[0, k]) )


def build_pool(rng, k, delta_log, bonf, depth=200, f32=False):
    """A column whose top-k product is exp(delta_log) * (SIG * 2 / bonf),
    padded with `depth - k` much smaller probs."""
    target_log = np.log(SIG * 2.0 / bonf) + delta_log
    per = np.exp(target_log / k)
    per = min(per, 0.99)
    top = np.full(k, per)
    # mild jitter on half the cases; exact ties on the other half
    if rng.random() < 0.5:
        j = rng.uniform(0.98, 1.02, k)
        top = np.minimum(top * j / np.prod(j) ** (1 / k), 0.999)
    rest = 10.0 ** rng.uniform(-12, -8, depth - k)
    row = np.concatenate([top, rest])
    rng.shuffle(row)
    return row.astype(np.float32).astype(np.float64) if f32 else row


@pytest.mark.parametrize("f32", [False, True])
def test_no_wrong_discard_at_boundary(f32):
    rng = np.random.default_rng(42)
    bonf = 3.0 * 100_000
    cases = []
    for k in [1, 2, 3, 8, 16, 32, 64]:
        for delta in [-0.7, -0.1, -1e-3, -1e-5, -1e-7,
                      1e-7, 1e-5, 1e-3, 0.1, 0.7]:
            cases.append((k, delta))
    depth = 200
    rows = []
    ks = []
    for k, delta in cases:
        rows.append(build_pool(rng, k, delta, bonf, depth, f32=f32))
        ks.append(k)
    probs = np.stack(rows)
    if f32:
        probs = probs.astype(np.float32)
    ks = np.asarray(ks)
    bonfs = np.full(len(ks), bonf)
    keep = _topk_prescreen(probs, ks, bonfs, SIG)
    n_disc = int((~keep).sum())
    assert n_disc > 0, "boundary sweep produced no discards at all"
    for i in np.nonzero(~keep)[0]:
        pv = exact_pv(probs[i].astype(np.float64), depth, int(ks[i]),
                      bonf)
        assert pv * bonf >= SIG, (
            f"wrongly discarded: k={ks[i]} pv*bonf={pv * bonf}")
    # and the kept near-boundary columns include genuinely significant
    # ones (the sweep brackets the boundary from both sides)
    sig_kept = 0
    for i in np.nonzero(keep)[0]:
        pv = exact_pv(probs[i].astype(np.float64), depth, int(ks[i]),
                      bonf)
        if pv * bonf < SIG:
            sig_kept += 1
    assert sig_kept > 0


def test_codes_prescreen_no_wrong_discard():
    """Same property for the code-native prescreen, via the real C
    quantizer (screen_codes_for)."""
    rng = np.random.default_rng(7)
    bonf = 3.0 * 100_000
    depth = 200
    rows, ks = [], []
    for k in [1, 2, 4, 8, 16, 32, 64]:
        for delta in [-0.5, -1e-3, -1e-6, 1e-6, 1e-3, 0.5]:
            rows.append(build_pool(rng, k, delta, bonf, depth))
            ks.append(k)
    flat = np.concatenate(rows).astype(np.float32)
    starts = np.arange(0, len(rows) * depth + 1, depth, dtype=np.int64)
    codes = screen_codes_for(flat, starts,
                             np.arange(len(rows), dtype=np.int64))
    if codes is None:
        pytest.skip("native lib unavailable")
    ks = np.asarray(ks)
    bonfs = np.full(len(ks), bonf)
    keep = prescreen_codes(codes, ks, bonfs, SIG, topk_max=_TOPK_MAX)
    n_disc = int((~keep).sum())
    assert n_disc > 0
    for i in np.nonzero(~keep)[0]:
        pv = exact_pv(rows[i], depth, int(ks[i]), bonf)
        assert pv * bonf >= SIG, (
            f"codes wrongly discarded: k={ks[i]} pv*bonf={pv * bonf}")
    # the codes bound is weaker than the f64 bound (quantized decodes):
    # its discards must be a subset of the f64 prescreen's
    probs = np.stack(rows)
    keep_f64 = _topk_prescreen(probs, ks, bonfs, SIG)
    assert not np.any(~keep & keep_f64)
