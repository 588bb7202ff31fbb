"""Whole-subcommand vcfset differential vs the reference's main_vcfset.

tests/golden/vcfset.json (tests/oracle/gen_vcfset_golden.sh) drives the
reference's vcfset subcommand (lofreq_vcfset.c:110) over fuzzed VCF
pairs with controlled overlap (same pos+allele / same pos different
allele / disjoint; SNVs, indels, non-PASS rows) x 14 argument sets —
intersect/complement/concat, only-pos/passed/snvs/indels, add-info,
count-only.  The repo CLI must match byte-for-byte (output VCF and the
count-only stdout line).
"""

import json
import os
import subprocess
import sys

import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "vcfset.json")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _cases():
    with open(GOLDEN) as fh:
        return json.load(fh)


@pytest.mark.parametrize("ci", range(len(_cases())))
def test_vcfset_differential(ci, tmp_path):
    case = _cases()[ci]
    p1 = tmp_path / "a.vcf"
    p2 = tmp_path / "b.vcf"
    p1.write_text(case["vcf1"])
    p2.write_text(case["vcf2"])
    vout = tmp_path / "out.vcf"
    if case.get("concat"):
        argv = ["-a", "concat", "-o", str(vout), "-1", str(p1), str(p2)]
    else:
        argv = ["-1", str(p1), "-2", str(p2), "-o", str(vout)] \
            + case["args"]
    env = dict(os.environ, PYTHONPATH=REPO)
    proc = subprocess.run(
        [sys.executable, "-m", "lofreq_tpu.cli", "vcfset"] + argv,
        capture_output=True, text=True, env=env, timeout=120)
    assert proc.returncode == case["rc"], proc.stderr[-2000:]
    if "--count-only" in case["args"]:
        assert proc.stdout == case["stdout"]
        return
    if case["output"] is None:
        return
    got = vout.read_text()
    if got != case["output"]:
        g = got.splitlines()
        w = case["output"].splitlines()
        for i, (a, b) in enumerate(zip(g, w)):
            assert a == b, f"line {i + 1}:\n  ours: {a}\n  ref : {b}"
        assert len(g) == len(w), (len(g), len(w))
