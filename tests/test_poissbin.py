"""Bit-identity tests of the exact Poisson-binomial engine against golden
values generated from the reference implementation
(tests/oracle/gen_golden.sh)."""

import json
import os

import numpy as np
import pytest

from lofreq_tpu.core.poissbin import (
    poissbin_single,
    pruned_prob_dist_batch,
    snpcaller_batch,
)

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "poissbin.json")


def load_cases():
    with open(GOLDEN) as fh:
        return json.load(fh)


CASES = load_cases()


@pytest.mark.parametrize("case_idx", range(len(CASES)))
def test_poissbin_vs_reference(case_idx):
    c = CASES[case_idx]
    probs = np.array(c["probs"], dtype=np.float64)
    pvalue, probvec = poissbin_single(probs, c["k"], c["bonf"], c["sig"])
    want_cells = np.array([float.fromhex(h) for h in c["probvec_hex"]])
    got_cells = probvec[: c["k"] + 1]
    np.testing.assert_array_equal(
        got_cells, want_cells,
        err_msg=f"case {case_idx}: DP cells differ (n={c['n']} k={c['k']})",
    )
    want_pv = np.longdouble(c["pvalue"])
    # longdouble round-trip through %.21Le is exact to ~1 ulp
    assert abs(float(pvalue) - float(want_pv)) <= max(
        1e-18, abs(float(want_pv)) * 1e-17
    )


def test_batch_matches_single():
    rng = np.random.default_rng(0)
    B, D = 17, 64
    probs = np.sort(10 ** (-rng.uniform(0.5, 5, (B, D))), axis=1)
    depths = rng.integers(5, D + 1, B)
    ks = rng.integers(1, 6, B)
    pv_b, _ = pruned_prob_dist_batch(probs, depths, ks, 1000.0, 0.01)
    for i in range(B):
        _, cells = poissbin_single(probs[i, : depths[i]], int(ks[i]), 1000.0, 0.01)
        np.testing.assert_array_equal(pv_b[i, : ks[i] + 1], cells[: ks[i] + 1])


def test_snpcaller_batch_contract():
    # column with a clear variant: 3 alt reads at q30 among 100 reads
    probs = np.full(100, 1e-3)
    pv = snpcaller_batch(
        probs[None, :], np.array([100]), np.array([[3, 1, 0]]), 1.0, 0.01
    )
    # P(X>=3) ~ C(100,3)*1e-9 ~ 1.6e-4, significant at bonf=1
    assert pv[0, 0] < 0.01
    assert pv[0, 1] > pv[0, 0]  # smaller count -> larger pvalue
    assert pv[0, 2] > 1e300  # LDBL_MAX for zero count
    # insignificant max count -> all LDBL_MAX
    pv2 = snpcaller_batch(
        np.full((1, 10), 0.4), np.array([10]), np.array([[2, 1, 0]]), 1.0, 0.01
    )
    assert np.all(pv2 > 1e300)


def test_merge_quals_native_matches_py():
    from lofreq_tpu.core.quals import (
        merge_srcq_mapq_baq_and_bq,
        merge_srcq_mapq_baq_and_bq_py,
    )

    rng = np.random.default_rng(2)
    n = 5000
    sq = rng.choice([-1, 0, 13, 40, 49314], n)
    mq = rng.choice([-1, 0, 1, 37, 60, 254], n)
    baq = rng.integers(-1, 94, n)
    bq = rng.integers(0, 94, n)
    a = merge_srcq_mapq_baq_and_bq(sq, mq, baq, bq)
    b = merge_srcq_mapq_baq_and_bq_py(sq, mq, baq, bq)
    np.testing.assert_array_equal(a, b)
