"""Bias-tool differential vs the reference's own lofreq2_bias.py.

tests/golden/bias.json (tests/oracle/gen_bias_cases.py) records the
output of the reference script run UNMODIFIED — Mann-Whitney MB/BB
p-values under the 2013 one-sided scipy semantics it shipped against,
Fisher-combined CB, prob_to_phredqual rounding, and the chosen-tag MTC
filter pass (lofreq2_bias.py:190-350) — over fuzzed read-set x VCF x
argset cases.  `cli bias` must reproduce every record exactly.
"""

import json
import os

import numpy as np
import pytest

from lofreq_tpu.cli import main
from lofreq_tpu.io.bai import build_bai
from lofreq_tpu.io.bam import BamHeader, BamRead, BamWriter

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "bias.json")


def _cases():
    with open(GOLDEN) as fh:
        return json.load(fh)


_CASES = _cases()


def _mk_bam(path, reads, chrom="b1", clen=300):
    header = BamHeader("@HD\tVN:1.6\tSO:coordinate\n", [(chrom, clen)])
    with BamWriter(path, header) as w:
        for i, d in enumerate(reads):
            r = BamRead()
            r.qname = f"r{i}"
            r.flag = d["flag"]
            r.tid = 0
            r.pos = d["pos"]
            r.mapq = d["mapq"]
            r.set_cigar_string(d["cigar"])
            r.seq = d["seq"].encode()
            r.qual = np.frombuffer(d["qual"].encode(), np.uint8) - 33
            w.write(r)
    build_bai(path)


@pytest.mark.parametrize(
    "ci", range(len(_CASES)), ids=[c["name"] for c in _CASES])
def test_bias_differential(ci, tmp_path, capsys):
    case = _CASES[ci]
    bam = str(tmp_path / "in.bam")
    _mk_bam(bam, case["reads"])
    vin = tmp_path / "in.vcf"
    vin.write_text(case["vcf"])
    out = str(tmp_path / "out.vcf")
    rc = main(["bias", "-b", bam, "-i", str(vin), "-o", out]
              + case["args"])
    assert rc in (0, None), case["name"]
    got = [l.rstrip("\n") for l in open(out) if not l.startswith("#")]
    assert got == case["expected"], case["name"]
