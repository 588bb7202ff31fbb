"""indelqual (BI/BD tag) differential vs the reference's own
add_dindel/add_uniform (lofreq_indelqual.c:218-306, linked unmodified
over an in-memory sam shim — tests/oracle/gen_indelqual_golden.sh).

Covers find_homopolymers, the DINDELQ table lookup at hpcount[x+1]
with the rlen-2 edge clamp, M/=/X/D/I/S/H walks, default-mask skips
(secondary/qcfail/dup reads keep their tags untouched), and ENCODE_Q
clamping in uniform mode.  The repo pipeline's tags must match
byte-for-byte.
"""

import json
import os

import numpy as np
import pytest

from lofreq_tpu.io.bai import build_bai
from lofreq_tpu.io.bam import BamHeader, BamRead, BamReader, BamWriter
from lofreq_tpu.io.fasta import write_fasta
from lofreq_tpu.pipelines.indelqual import run_indelqual

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "indelqual.json")


def _cases():
    with open(GOLDEN) as fh:
        return json.load(fh)


def _mk_read(i, spec):
    r = BamRead()
    r.qname = f"r{i}"
    r.flag = spec["flag"]
    r.tid = 0
    r.pos = spec["pos"]
    r.mapq = 50
    r.seq = spec["seq"].encode()
    r.qual = np.array(spec["qual"], dtype=np.uint8)
    r.set_cigar_string(spec["cigar"])
    return r


@pytest.mark.parametrize("ci", range(len(_cases())))
def test_indelqual_differential(ci, tmp_path):
    case = _cases()[ci]
    chrom = "t"
    fa = str(tmp_path / "ref.fa")
    write_fasta(fa, {chrom: case["ref"]})
    header = BamHeader("@HD\tVN:1.6\tSO:coordinate\n",
                       [(chrom, len(case["ref"]))])
    bam = str(tmp_path / "in.bam")
    # keep ORIGINAL read order (the oracle streams in input order); the
    # reads are not coordinate-sorted, which run_indelqual tolerates
    with BamWriter(bam, header) as w:
        for i, spec in enumerate(case["reads"]):
            w.write(_mk_read(i, spec))
    out = str(tmp_path / "out.bam")
    if case["mode"] == "dindel":
        run_indelqual(bam, out, dindel=True, ref_path=fa)
    else:
        run_indelqual(bam, out, uniform=(case["iq"], case["dq"]))
    got = []
    for r in BamReader(out).fetch(chrom):
        bi = r.get_tag("BI")
        bd = r.get_tag("BD")
        got.append([bi if bi is not None else "-",
                    bd if bd is not None else "-"])
    assert got == case["expected"]
