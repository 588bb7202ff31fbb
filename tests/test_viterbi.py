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


def test_viterbi_lane_kernels_bit_identical_fuzz():
    """viterbi_x4/x8 lanes vs the scalar kernel: same (shift, aln) for
    random same-geometry groups, incl. Q2 walls (median replacement), N
    bases, pure-mismatch reads and indel-bearing queries."""
    import numpy as np

    from lofreq_tpu.ops.viterbi import viterbi_align, viterbi_align_group

    rng = np.random.default_rng(13)
    for case in range(30):
        ql = int(rng.integers(10, 160))
        rl = ql + int(rng.integers(-3, 24))
        nl = 8 if case % 2 else 4
        preps = []
        for _ in range(nl):
            ref = rng.choice(list(b"ACGT"), rl).astype(np.uint8)
            q = ref[: ql].copy() if rl >= ql else \
                np.concatenate([ref, rng.choice(list(b"ACGT"), ql - rl)
                                .astype(np.uint8)])
            mut = rng.random(ql) < rng.choice([0.02, 0.3])
            q[mut] = rng.choice(list(b"ACGTN"), int(mut.sum()))
            bq = rng.choice(
                np.array([2, 2, 17, 30, 41], dtype=np.uint8), ql) + 33
            q2d = int(rng.integers(2, 40))
            preps.append((q.tobytes(), bq.tobytes(), q2d, ref.tobytes()))
        got = viterbi_align_group(preps, nl)
        want = [viterbi_align(p[3], p[0], p[1], p[2]) for p in preps]
        assert got == want, f"case {case} nl={nl} ql={ql} rl={rl}"
