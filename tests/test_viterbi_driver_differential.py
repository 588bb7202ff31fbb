"""Viterbi realignment DRIVER differential vs the reference's own
main_viterbi/fetch_func (lofreq_viterbi.c:107-345, linked unmodified —
tests/oracle/gen_viterbi_driver_golden.sh).  The DP kernel itself is
golden-tested separately (tests/golden/viterbi.json); this pins the
read-level decisions: indel-free/hard-clip/unmapped passthrough, Q2
tail handling (--defqual), soft-clip re-attachment, --keepflags tag
stripping, --reclip leading/trailing-insert conversion, CIGAR
replacement and position shifts.
"""

import json
import os

import numpy as np
import pytest

from lofreq_tpu.io.bai import build_bai
from lofreq_tpu.io.bam import BamHeader, BamRead, BamReader, BamWriter
from lofreq_tpu.io.fasta import write_fasta
from lofreq_tpu.ops.viterbi import run_viterbi

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "viterbi_driver.json")


def _cases():
    with open(GOLDEN) as fh:
        return json.load(fh)


def _mk_read(i, spec):
    r = BamRead()
    r.qname = f"r{i}"
    r.flag = spec["flag"]
    r.tid = 0 if not (spec["flag"] & 4) else 0
    r.pos = spec["pos"]
    r.mapq = spec["mapq"]
    r.seq = spec["seq"].encode()
    r.qual = np.array(spec["qual"], dtype=np.uint8)
    r.set_cigar_string(spec["cigar"])
    return r


@pytest.mark.parametrize("ci", range(len(_cases())))
def test_viterbi_driver_differential(ci, tmp_path):
    case = _cases()[ci]
    chrom = "t"
    fa = str(tmp_path / "ref.fa")
    write_fasta(fa, {chrom: case["ref"]})
    header = BamHeader("@HD\tVN:1.6\tSO:coordinate\n",
                       [(chrom, len(case["ref"]))])
    bam = str(tmp_path / "in.bam")
    with BamWriter(bam, header) as w:
        for i, spec in enumerate(case["reads"]):
            w.write(_mk_read(i, spec))
    out = str(tmp_path / "out.bam")
    run_viterbi(bam, out, fa, q2default=case["q2def"],
                del_flags=not case["keepflags"],
                reclip=bool(case["reclip"]))
    got = []
    for r in BamReader(out).fetch(chrom):
        got.append(dict(pos=r.pos, cigar=r.cigar_string(),
                        qual="".join(chr(q + 33) for q in r.qual),
                        flag=r.flag))
    assert got == case["expected"]
