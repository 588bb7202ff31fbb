"""Viterbi realigner bit-identity tests vs reference golden values."""

import json
import os

import numpy as np
import pytest

from lofreq_tpu.ops.viterbi import realign_read, viterbi_align

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "viterbi.json")
with open(GOLDEN) as fh:
    CASES = json.load(fh)


@pytest.mark.parametrize("idx", range(len(CASES)))
def test_viterbi_vs_reference(idx):
    c = CASES[idx]
    shift, aln = viterbi_align(c["ref"].encode(), c["query"].encode(),
                               c["bqual"].encode(), c["q2def"])
    assert aln == c["aln"], f"aln mismatch case {idx}"
    assert shift == c["shift"], f"shift mismatch case {idx}"


def test_realign_read_fixes_cigar():
    """A read with a misplaced indel gets a clean M cigar back
    (cf. tests/viterbi.sh: corrupted CIGARs realigned to 75M)."""
    from lofreq_tpu.io.bam import BamRead

    rng = np.random.default_rng(5)
    genome = "".join(rng.choice(list("ACGT"), 300))
    r = BamRead()
    r.qname = "v"
    r.tid = 0
    r.pos = 100
    seq = genome[100:175]
    r.seq = seq.encode()
    r.qual = np.full(75, 30, dtype=np.uint8)
    # corrupt the cigar: claim an ins+del that cancel out
    r.set_cigar_string("30M2I2D43M")
    changed = realign_read(r, genome.encode())
    assert changed
    assert r.cigar_string() == "75M"
    assert r.pos == 100
