"""Orchestration-layer differential: the reference's own
lofreq2_somatic.py and lofreq2_call_pparallel.py run UNMODIFIED
(from /root/reference/src/scripts) against a shim `lofreq` executable
that forwards every subcommand to this package's CLI.

This pins the pipelines/somatic.py and pipelines/parallel_call.py
transcriptions against the scripts they re-architect: every stage's
flags, file naming, log-parsing contract (the "Number of ... tests
performed" lines), the bonferroni arithmetic the wrapper derives from
worker logs (lofreq2_call_pparallel.py:125-162,344-738), and the
six-stage somatic flow incl. rlx->str filtering, vcfset complements
and the final uniq (lofreq2_somatic.py:280-542).

The pparallel script shells out to `bcftools concat -a -O z` /
`bcftools index -t` (lofreq2_call_pparallel.py:164-185); the shim
bcftools reimplements exactly those two invocations over this
package's bgzf/tabix IO, preserving the script's region file order.
"""

import gzip
import os
import subprocess
import sys

import pytest

from test_somatic import make_pair

from lofreq_tpu.cli import main
from lofreq_tpu.io.vcf import VcfReader

REF_SCRIPTS = "/root/reference/src/scripts"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_SCRIPTS), reason="reference checkout absent")


BCFTOOLS_SHIM = '''#!{python}
"""bcftools shim: exactly the two invocations lofreq2_call_pparallel.py
makes (concat -a -O z -o OUT ins... / index -t F)."""
import sys

sys.path.insert(0, {repo!r})
import gzip

from lofreq_tpu.io.bgzf import BgzfWriter
from lofreq_tpu.io.tabix import build_tbi

args = sys.argv[1:]
if args[0] == "concat":
    out = args[args.index("-o") + 1]
    ins = [a for a in args[1:] if a.endswith(".vcf.gz") and a != out]
    w = BgzfWriter(out)
    wrote_header = False
    for i, path in enumerate(ins):
        with gzip.open(path, "rt") as fh:
            for line in fh:
                if line.startswith("#"):
                    if not wrote_header:
                        w.write(line.encode())
                else:
                    w.write(line.encode())
        wrote_header = True
    w.close()
elif args[0] == "index":
    assert args[1] == "-t"
    build_tbi(args[2])
else:
    sys.exit("bcftools shim: unsupported: " + " ".join(args))
'''


@pytest.fixture(scope="module")
def shim(tmp_path_factory):
    d = tmp_path_factory.mktemp("shimbin")
    lofreq = d / "lofreq"
    lofreq.write_text(
        "#!/bin/sh\n"
        f'PYTHONPATH={REPO} exec {sys.executable} -m lofreq_tpu.cli "$@"\n')
    lofreq.chmod(0o755)
    bcftools = d / "bcftools"
    bcftools.write_text(BCFTOOLS_SHIM.format(python=sys.executable,
                                             repo=REPO))
    bcftools.chmod(0o755)
    env = dict(os.environ,
               PATH=f"{d}:{os.environ.get('PATH', '')}",
               PYTHONPATH=REPO,
               JAX_PLATFORMS="cpu")
    return dict(dir=str(d), env=env)


@pytest.fixture(scope="module")
def pair(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("orch")
    return make_pair(str(tmp))


def _records(path):
    op = gzip.open if path.endswith(".gz") else open
    with op(path, "rt") as fh:
        return [l.rstrip("\n") for l in fh if not l.startswith("#")]


def _filter_lines(path):
    """##FILTER headers: the wrapper-derived thresholds must agree."""
    op = gzip.open if path.endswith(".gz") else open
    with op(path, "rt") as fh:
        return [l.rstrip("\n") for l in fh if l.startswith("##FILTER")]


def test_somatic_script_unmodified(pair, shim, tmp_path):
    """Reference lofreq2_somatic.py end-to-end over the shim lofreq,
    vs pipelines/somatic.py: identical records in every final and
    intermediate stage VCF."""
    ref_pref = str(tmp_path / "ref_")
    proc = subprocess.run(
        [sys.executable, os.path.join(REF_SCRIPTS, "lofreq2_somatic.py"),
         "-n", pair["normal"], "-t", pair["tumor"], "-f", pair["fa"],
         "-o", ref_pref, "--threads", "1", "--baq-off"],
        capture_output=True, text=True, env=shim["env"], timeout=1200)
    assert proc.returncode == 0, proc.stderr[-4000:]

    our_pref = str(tmp_path / "our_")
    rc = main(["somatic", "-n", pair["normal"], "-t", pair["tumor"],
               "-f", pair["fa"], "-o", our_pref, "--threads", "1",
               "--baq-off"])
    assert rc == 0

    stages = [
        "normal_relaxed.vcf.gz",
        "normal_stringent.snvs.vcf.gz",
        "tumor_relaxed.vcf.gz",
        "tumor_stringent.snvs.vcf.gz",
        "somatic_raw.snvs.vcf.gz",
        "somatic_final.snvs.vcf.gz",
    ]
    compared = 0
    for st in stages:
        rf, of = ref_pref + st, our_pref + st
        assert os.path.exists(rf), f"reference script didn't produce {st}"
        assert os.path.exists(of), f"our pipeline didn't produce {st}"
        assert _records(rf) == _records(of), st
        assert _filter_lines(rf) == _filter_lines(of), st
        compared += 1
    assert compared == len(stages)
    # the pipeline found real somatic variants (not an empty-vs-empty tie)
    assert len(_records(ref_pref + "somatic_final.snvs.vcf.gz")) >= 2


def test_pparallel_script_unmodified(pair, shim, tmp_path):
    """Reference lofreq2_call_pparallel.py (region binning, worker log
    count summing, derived-bonf final filter, bcftools concat contract)
    vs pipelines/parallel_call.py at the same thread count."""
    # the script requires a pre-built .fai (lofreq2_call_pparallel.py
    # checks for it up front)
    main(["faidx", pair["fa"]])
    ref_out = str(tmp_path / "ref_par.vcf.gz")
    proc = subprocess.run(
        [sys.executable,
         os.path.join(REF_SCRIPTS, "lofreq2_call_pparallel.py"),
         "--pp-threads", "2", "-f", pair["fa"], "-o", ref_out,
         pair["tumor"]],
        capture_output=True, text=True, env=shim["env"], timeout=1200)
    assert proc.returncode == 0, proc.stderr[-4000:]

    our_out = str(tmp_path / "our_par.vcf.gz")
    rc = main(["call-parallel", "--pp-threads", "2", "-f", pair["fa"],
               "-o", our_out, pair["tumor"]])
    assert rc == 0
    assert _records(ref_out) == _records(our_out)
    # the script's concat keeps worker 0's own header (whose FILTER
    # lines carry worker-LOCAL dynamic thresholds and whose ##source
    # embeds a random tmpdir — nondeterministic by the reference's own
    # design); the final filter appends the derived global thresholds.
    # Ours must reproduce exactly those appended lines.
    ref_fl, our_fl = _filter_lines(ref_out), _filter_lines(our_out)
    assert len(ref_fl) > len(our_fl)  # worker-0 lines present on top
    assert ref_fl[-len(our_fl):] == our_fl
    assert len(_records(ref_out)) > 0

    # single-call equivalence: the reference's own invariant
    # (ecoli-clone_incl_parallel.sh:56-62) holds exactly here
    single = str(tmp_path / "single.vcf")
    assert main(["call", "-f", pair["fa"], "-o", single,
                 pair["tumor"]]) == 0
    assert _records(ref_out) == _records(single)
