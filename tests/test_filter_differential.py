"""Whole-subcommand filter differential vs the reference's main_filter.

tests/golden/filter.json (tests/oracle/gen_filter_golden.sh) drives the
reference's ENTIRE filter subcommand (lofreq_filter.c:861) file-to-file
over fuzzed VCFs x 24 argument sets — parse/re-emit, FILTER header
registration, thresholds, two-pass bonf/holm/fdr MTC, compound SB,
defaults, only-passed emission.  Here `python -m lofreq_tpu.cli filter`
runs the same (input, args) and the output VCF must match byte-for-byte.
"""

import json
import os
import subprocess
import sys

import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "filter.json")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _cases():
    with open(GOLDEN) as fh:
        return json.load(fh)


@pytest.mark.parametrize("ci", range(len(_cases())))
def test_filter_differential(ci, tmp_path):
    case = _cases()[ci]
    vin = tmp_path / "in.vcf"
    vin.write_text(case["vcf"])
    vout = tmp_path / "out.vcf"
    env = dict(os.environ, PYTHONPATH=REPO)
    proc = subprocess.run(
        [sys.executable, "-m", "lofreq_tpu.cli", "filter",
         "-i", str(vin), "-o", str(vout)] + case["args"],
        capture_output=True, text=True, env=env, timeout=120)
    assert proc.returncode == case["rc"], proc.stderr[-2000:]
    if case["output"] is None:
        assert not vout.exists()
        return
    got = vout.read_text()
    if got != case["output"]:
        g = got.splitlines()
        w = case["output"].splitlines()
        for i, (a, b) in enumerate(zip(g, w)):
            assert a == b, f"line {i + 1}:\n  ours: {a}\n  ref : {b}"
        assert len(g) == len(w), (len(g), len(w))
