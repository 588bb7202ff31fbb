"""Whole-subcommand `call` differential vs the reference's own main_call.

The golden (tests/golden/call_e2e.json) is produced by linking the
reference's main_call (lofreq_call.c:1006) UNMODIFIED — together with
plp.c's mpileup loop, snpcaller, bam_md_ext BAQ/IDAQ, source_qual and
the intercepted system("lofreq filter ...") auto-filter chain
(lofreq_call.c:1506-1552) — over an in-memory sam/pileup shim
(tests/oracle/oracle_call_e2e.c) and driving it file-to-file on fuzzed
BAM x argument-set cases (tests/oracle/gen_call_e2e_cases.py).

Here each case's minisam text is converted to a real BAM and `cli call`
is run with the very same argument vector; the final VCF must match
byte-for-byte (modulo ##fileDate, which is wall-clock), and the
"Number of ... tests performed" stderr lines (parsed by the somatic /
call-parallel wrappers) must match exactly.

Covered interactions that the per-layer differentials cannot see:
mplp_func hook ordering with on-the-fly BAQ/SQ (plp.c:667-741),
ref-fetch across chromosomes, region/BED masking, dynamic-bonf
sequencing across real columns, and the auto-filter threshold
derivation from the final test counts.
"""

import json
import os
import re

import numpy as np
import pytest

from lofreq_tpu.cli import main
from lofreq_tpu.io.bai import build_bai
from lofreq_tpu.io.bam import BamHeader, BamRead, BamWriter

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "call_e2e.json")


def _cases():
    with open(GOLDEN) as fh:
        return json.load(fh)


_CASES = _cases()


def _minisam_to_bam(text: str, bam_path: str) -> None:
    refs = []
    reads = []
    for line in text.splitlines():
        if not line:
            continue
        if line.startswith("@SQ"):
            _tag, name, ln = line.split()
            refs.append((name, int(ln)))
            continue
        f = line.split()
        r = BamRead()
        r.qname = f[0]
        r.flag = int(f[1])
        r.tid = next(i for i, (n, _l) in enumerate(refs) if n == f[2])
        r.pos = int(f[3])
        r.mapq = int(f[4])
        r.set_cigar_string(f[5])
        r.seq = f[6].encode()
        r.qual = np.frombuffer(f[7].encode(), dtype=np.uint8) - 33
        for tag in f[8:]:
            name, typecode, val = tag.split(":", 2)
            r.set_tag(name, typecode, val)
        reads.append(r)
    header = BamHeader("@HD\tVN:1.6\tSO:coordinate\n", refs)
    with BamWriter(bam_path, header) as w:
        for r in reads:
            w.write(r)
    build_bai(bam_path)


def _norm(vcf: str) -> str:
    # fileDate is wall-clock on both sides
    return re.sub(r"##fileDate=\d+", "##fileDate=X", vcf)


@pytest.mark.parametrize(
    "ci", range(len(_CASES)), ids=[c["name"] for c in _CASES])
def test_call_e2e_differential(ci, tmp_path, monkeypatch, capsys):
    case = _CASES[ci]
    for fn, content in case["files"].items():
        if fn == "in.bam":
            _minisam_to_bam(content, str(tmp_path / fn))
        else:
            (tmp_path / fn).write_text(content)
    monkeypatch.chdir(tmp_path)
    rc = main(["call"] + case["args"])
    err = capsys.readouterr().err
    assert rc == 0, f"{case['name']}: rc={rc}\n{err}"
    got = (tmp_path / "out.vcf").read_text()
    assert _norm(got) == _norm(case["expected_vcf"]), case["name"]
    counts = [None, None]
    for line in err.splitlines():
        if "substitution tests performed" in line:
            counts[0] = int(line.rsplit(":", 1)[1])
        elif "indel tests performed" in line:
            counts[1] = int(line.rsplit(":", 1)[1])
    exp = case["expected_counts"]
    # the oracle reports indel counts only in indel mode (stderr line
    # absent otherwise -> None on its side stays None here too)
    assert counts[0] == exp[0], case["name"]
    if exp[1] is not None:
        assert counts[1] == exp[1], case["name"]
