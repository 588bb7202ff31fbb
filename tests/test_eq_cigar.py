"""'='(CEQUAL) CIGAR-op parity in the source-qual op count.

The reference's count_cigar_ops handles only CMATCH/CDIFF
(samutils.c:481,489): a '=' op falls into the final warn-only branch and
contributes no evidence (it also fails to advance qpos there, after
which the qpos==qlen assert aborts — we advance positions instead of
reproducing that abort; see pileup/sourcequal.py:count_cigar_ops).
Default = parity (skip '='), LOFREQ-side fix = opt-in via
PileupConf.sq_count_eq / count_eq=True.
"""

import numpy as np
import pytest

from lofreq_tpu.io.bai import build_bai
from lofreq_tpu.io.bam import BamHeader, BamRead, BamReader, BamWriter
from lofreq_tpu.io.fasta import Fasta, write_fasta
from lofreq_tpu.pileup.engine import PileupConf, read_passes_filters
from lofreq_tpu.pileup.native_ingest import ingest_region
from lofreq_tpu.pileup.sourcequal import compute_source_quals, count_cigar_ops

REF = b"ACGTACGTACGTACGTACGTACGTACGTACGTACGTACGT"  # 40 bp


def _read(qname, pos, seq, cigar, bq=30, flag=0):
    r = BamRead()
    r.qname = qname
    r.flag = flag
    r.tid = 0
    r.pos = pos
    r.mapq = 50
    r.seq = seq
    r.qual = np.full(len(seq), bq, np.uint8)
    r.set_cigar_string(cigar)
    return r


def test_count_cigar_ops_skips_eq_by_default():
    # 10= (identical), 5X (mismatching), 10M with 1 mismatch
    seq = bytearray(REF[0:25])
    for i in range(10, 15):  # the X block: force non-ref bases
        seq[i] = ord("A") if REF[i] != ord("A") else ord("C")
    seq[20] = ord("A") if REF[20] != ord("A") else ord("C")  # M mismatch
    r = _read("r1", 0, bytes(seq), "10=5X10M")

    quals, nonmatch = count_cigar_ops(r, REF, min_bq=6)
    # '=' bases contribute nothing: 5 X-mismatches + 9 M-matches + 1 M-mism
    assert len(quals) == 15
    assert nonmatch == 6

    quals_eq, nonmatch_eq = count_cigar_ops(r, REF, min_bq=6,
                                            count_eq=True)
    assert len(quals_eq) == 25  # the 10 '=' bases now count as matches
    assert nonmatch_eq == 6


def test_eq_positions_still_advance():
    # '=' inside the read must not desync downstream ops: the mismatch in
    # the trailing M block is found at the correct reference offset
    seq = bytearray(REF[5:30])
    seq[-1] = ord("A") if REF[29] != ord("A") else ord("C")
    r = _read("r2", 5, bytes(seq), "20=5M")
    quals, nonmatch = count_cigar_ops(r, REF, min_bq=6)
    assert len(quals) == 5 and nonmatch == 1


@pytest.mark.parametrize("count_eq", [False, True])
def test_native_matches_python_on_eq_bam(tmp_path, count_eq):
    chrom = "eqref"
    fa = str(tmp_path / "ref.fa")
    write_fasta(fa, {chrom: REF.decode()})
    header = BamHeader("@HD\tVN:1.6\tSO:coordinate\n", [(chrom, len(REF))])

    reads = []
    # plain M read
    reads.append(_read("m1", 0, REF[0:30], "30M"))
    # '='/'X' style read with mismatches in X and M parts
    seq = bytearray(REF[0:25])
    for i in range(10, 15):
        seq[i] = ord("A") if REF[i] != ord("A") else ord("C")
    seq[20] = ord("A") if REF[20] != ord("A") else ord("C")
    reads.append(_read("e1", 0, bytes(seq), "10=5X10M"))
    # '=' with an indel after it
    seq2 = bytearray(REF[2:22]) + bytearray(b"AC") + bytearray(REF[22:30])
    reads.append(_read("e2", 2, bytes(seq2), "20=2I8M"))

    bam = str(tmp_path / "eq.bam")
    with BamWriter(bam, header) as w:
        for r in reads:
            w.write(r)
    build_bai(bam)

    pconf = PileupConf(use_baq=False, use_idaq=False, use_sq=True,
                       no_orphan=False, sq_count_eq=count_eq)
    ref = Fasta(fa).fetch(chrom)

    native = ingest_region(BamReader(bam), pconf, ref, 0)

    py_reads = [r for r in BamReader(bam).fetch(chrom)
                if read_passes_filters(r, pconf, chrom)]
    compute_source_quals(py_reads, ref, pconf.def_nm_q,
                         count_eq=count_eq)
    # map per-read sq onto rows via position-0 coverage ordering: compare
    # the multiset of (pos, sq) pairs instead (row order differs)
    py_pairs = []
    for r in py_reads:
        sq = r.get_tag("sq")
        tpos = r.pos
        for op, l in r.cigar_ops():
            if op in (0, 7, 8):  # M/=/X
                py_pairs.extend((tpos + j, sq) for j in range(l))
                tpos += l
            elif op == 2:
                py_pairs.extend((tpos + j, sq) for j in range(l))
                tpos += l
            elif op == 3:
                tpos += l
    nat_pairs = list(zip(native.pos.tolist(), native.sq.tolist()))
    assert sorted(nat_pairs) == sorted(py_pairs)


def test_flag_changes_sq():
    """count_eq observably changes the computed source qual: an all-'='
    read has an EMPTY op pool under parity (sq stored as 0, the
    plp.c:733-735 '-1 -> 0' path), but counts as all-match under the
    opt-in fix (sq = PROB_TO_PHREDQUAL(LDBL_MIN), the huge sentinel)."""
    r1 = _read("e1", 0, REF[0:25], "25=")
    r2 = _read("e1", 0, REF[0:25], "25=")
    compute_source_quals([r1], REF, -1, count_eq=False)
    compute_source_quals([r2], REF, -1, count_eq=True)
    assert r1.get_tag("sq") == 0
    assert r2.get_tag("sq") > 1000  # PROB_TO_PHREDQUAL(LDBL_MIN)
