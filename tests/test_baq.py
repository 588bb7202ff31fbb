"""BAQ/IDAQ bit-identity tests against reference golden values."""

import json
import os

import numpy as np
import pytest

from lofreq_tpu.io.bam import BamRead
from lofreq_tpu.ops.baq_hmm import realn_batch

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "baq.json")

with open(GOLDEN) as fh:
    _G = json.load(fh)
GENOME = _G["genome"].encode()
CASES = _G["cases"]


def _mk_read(c):
    r = BamRead()
    r.qname = "r"
    r.tid = 0
    r.pos = c["pos"]
    r.seq = c["seq"].encode()
    r.qual = np.frombuffer(c["qual"].encode("latin-1"), dtype=np.uint8) - 33
    r.set_cigar_string(c["cigar"])
    return r


@pytest.mark.parametrize("idx", range(len(CASES)))
def test_baq_vs_reference(idx):
    c = CASES[idx]
    r = _mk_read(c)
    realn_batch([r], GENOME, baq=True, ext_baq=bool(c["ext"]), idaq=True)
    got_lb = r.get_tag("lb") or "-"
    got_ai = r.get_tag("ai") or "-"
    got_ad = r.get_tag("ad") or "-"
    assert got_lb == c["lb"], f"lb mismatch case {idx} ({c['cigar']})"
    assert got_ai == c["ai"], f"ai mismatch case {idx} ({c['cigar']})"
    assert got_ad == c["ad"], f"ad mismatch case {idx} ({c['cigar']})"


def test_batch_consistency():
    reads = [_mk_read(c) for c in CASES if c["ext"] == 1]
    realn_batch(reads, GENOME, baq=True, ext_baq=True, idaq=True)
    for r, c in zip(reads, (c for c in CASES if c["ext"] == 1)):
        assert (r.get_tag("lb") or "-") == c["lb"]


def test_skip_when_tags_present():
    c = CASES[0]
    r = _mk_read(c)
    r.set_tag("lb", "Z", "X" * len(c["seq"]))
    from lofreq_tpu.ops.baq import add_alnqual_tags

    add_alnqual_tags([r], GENOME)
    assert r.get_tag("lb") == "X" * len(c["seq"])  # untouched
    # redo recomputes
    add_alnqual_tags([r], GENOME, redo_baq=True)
    assert r.get_tag("lb") == c["lb"]
