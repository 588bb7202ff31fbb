"""Column-level differential test vs the reference implementation.

tests/golden/call_snvs.json holds, per randomized column, the output of the
*reference's own* plp_to_errprobs + snpcaller (compiled by
tests/oracle/gen_call_snvs_golden.sh from lofreq_call.c:735-877 semantics).
This test feeds identical columns through the repo's batched path
(snv_errprobs_for_batch + _snpcaller_with_screen) and asserts bit-identical
filtered counts, err-prob multisets (XOR of float64 bit patterns) and
long-double p-values — with and without the device screen."""

import json
import os
from types import SimpleNamespace

import numpy as np
import pytest

from lofreq_tpu.call.caller import (VarcallConf, _snpcaller_with_screen,
                                    pack_probs, snv_errprobs_for_batch)
from lofreq_tpu.core import phred as PH

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "call_snvs.json")


def _load():
    with open(GOLDEN) as fh:
        return json.load(fh)


CASES = _load()


def _fake_batch(case):
    """Single-column stand-in exposing the fields the err-prob extraction
    reads; rows are laid out nt4-grouped like the reference iterates (order
    is irrelevant: the DP input is sorted, the checksum XOR-reduced)."""
    nt4, bq, baq, mq, sq = [], [], [], [], []
    for i, group in enumerate(case["quads"]):
        for (b, ba, m, s) in group:
            nt4.append(i)
            bq.append(b)
            baq.append(ba)
            mq.append(m)
            sq.append(s)
    n = len(nt4)
    return SimpleNamespace(
        positions=np.array([0]),
        ref_nt4=np.array([case["ref_idx"]], dtype=np.int64),
        b_nt4=np.array(nt4, dtype=np.int64),
        b_bq=np.array(bq, dtype=np.int64),
        b_baq=np.array(baq, dtype=np.int64),
        b_mq=np.array(mq, dtype=np.int64),
        b_sq=np.array(sq, dtype=np.int64),
        col_start=np.array([0, n], dtype=np.int64),
    )


def _conf(case, device_screen=False):
    c = case["conf"]
    return VarcallConf(
        min_bq=c["min_bq"], min_alt_bq=c["min_alt_bq"],
        def_alt_bq=c["def_alt_bq"], min_jq=c["min_jq"],
        min_alt_jq=c["min_alt_jq"], def_alt_jq=c["def_alt_jq"],
        use_baq=bool(c["flag"] & 1), use_mq=bool(c["flag"] & 2),
        use_sq=bool(c["flag"] & 4), sig=c["sig"],
        bonf_dynamic=False, use_device_screen=device_screen,
    )


def _xor_hash(probs):
    if len(probs) == 0:
        return "0" * 16
    bits = np.ascontiguousarray(probs, dtype=np.float64).view(np.uint64)
    h = np.bitwise_xor.reduce(bits)
    return f"{int(h):016x}"


@pytest.mark.parametrize("device_screen", [False, True],
                         ids=["exact", "screened"])
def test_call_snvs_differential(device_screen):
    mismatches = []
    for ci, case in enumerate(CASES):
        batch = _fake_batch(case)
        conf = _conf(case, device_screen)
        ep = snv_errprobs_for_batch(batch, conf)
        depth = int(ep["depths"][0])
        alt_counts = ep["alt_counts"][0]
        alt_raw = ep["alt_raw_counts"][0]

        if depth != case["num_err_probs"]:
            mismatches.append((ci, "num_err_probs", depth,
                               case["num_err_probs"]))
            continue
        if list(alt_counts) != case["alt_counts"]:
            mismatches.append((ci, "alt_counts", list(alt_counts),
                               case["alt_counts"]))
            continue
        if list(alt_raw) != case["alt_raw_counts"]:
            mismatches.append((ci, "alt_raw_counts", list(alt_raw),
                               case["alt_raw_counts"]))
            continue

        probs = pack_probs(ep["flat_probs"], ep["starts"], ep["depths"],
                           np.array([0]))
        got_hash = _xor_hash(probs[0, :depth])
        if got_hash != case["xor_hash"]:
            mismatches.append((ci, "xor_hash", got_hash, case["xor_hash"]))
            continue

        bonf = np.array([float(case["conf"]["bonf"])])
        if alt_counts.sum() == 0:
            pv = np.full((1, 3), PH.LDBL_MAX, dtype=np.longdouble)
        else:
            pv = _snpcaller_with_screen(
                probs, ep["depths"][:1], ep["alt_counts"][:1], bonf, conf)
        for i in range(3):
            want = np.longdouble(case["pvalues"][i])
            got = pv[0, i]
            if device_screen:
                # the screen only prunes columns that cannot be significant;
                # pruned pvalues read LDBL_MAX where the exact value would
                # also have failed the sig test
                sig, b = case["conf"]["sig"], case["conf"]["bonf"]
                with np.errstate(over="ignore"):
                    want_sig = want * np.longdouble(b) < sig
                    got_sig = got * np.longdouble(b) < sig
                if want_sig != got_sig:
                    mismatches.append((ci, f"sig[{i}]", got, want))
                elif want_sig and got != want:
                    mismatches.append((ci, f"pv[{i}]", got, want))
            elif got != want:
                mismatches.append((ci, f"pv[{i}]", got, want))
    assert not mismatches, mismatches[:10]


def test_case_count():
    # differential coverage should not silently shrink
    assert len(CASES) >= 80
