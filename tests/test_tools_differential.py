"""Differentials vs the reference's own pure-python tools.

tests/golden/tools.json (tests/oracle/gen_tools_golden.sh) records:
  - lofreq2_indel_ovlp.py run unmodified over fuzzed overlap-cluster
    VCFs (qual ties broken by AF, '.' quals, multi-chrom stacks)
  - lofreq_star.multiple_testing Bonferroni/HolmBonferroni corrected
    p-values and lofreq_star.fdr index selection over fuzzed pools
The repo's `cli indel-ovlp` and core/multtest must match exactly.
"""

import json
import os
import subprocess
import sys

import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "tools.json")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _golden():
    with open(GOLDEN) as fh:
        return json.load(fh)


@pytest.mark.parametrize("ci", range(len(_golden()["indel_ovlp"])))
def test_indel_ovlp_differential(ci, tmp_path):
    case = _golden()["indel_ovlp"][ci]
    vin = tmp_path / "in.vcf"
    vin.write_text(case["vcf"])
    env = dict(os.environ, PYTHONPATH=REPO)
    proc = subprocess.run(
        [sys.executable, "-m", "lofreq_tpu.cli", "indel-ovlp", str(vin)],
        capture_output=True, text=True, env=env, timeout=120)
    assert proc.returncode == 0, proc.stderr[-2000:]
    got = proc.stdout.splitlines()
    want = case["output"].splitlines()
    for i, (a, b) in enumerate(zip(got, want)):
        assert a == b, f"line {i + 1}:\n  ours: {a}\n  ref : {b}"
    assert len(got) == len(want)


@pytest.mark.parametrize("ci", range(30))
def test_multtest_differential(ci):
    """core/multtest (the lofreq_star re-export used by `cli bias`)
    vs the reference's python Bonferroni/fdr.  The python
    HolmBonferroni is not compared: no shipped reference path invokes
    it (lofreq2_bias.py's holmbonf branch applies plain Bonferroni)."""
    import numpy as np

    from lofreq_tpu.core.multtest import bonf_corr, fdr

    case = _golden()["multtest"][ci]
    pvals = np.asarray(case["pvals"], dtype=np.float64)
    n = case["n"] if case["n"] else len(pvals)
    got_bonf = list(bonf_corr(pvals, n))
    assert got_bonf == case["bonf"]
    got_fdr = sorted(int(j) for j in fdr(pvals, case["a"], n))
    assert got_fdr == sorted(case["fdr"])
