"""E.coli-scale end-to-end test (opt-in: slow).

Enable with LOFREQ_TPU_SCALE_TESTS=1.  Mirrors the oracle of
ecoli-clone_incl_parallel.sh: large genome, parallel == single, bounded
false positives.
"""

import os
import subprocess
import sys
import time

import pytest

RUN = bool(os.environ.get("LOFREQ_TPU_SCALE_TESTS"))


@pytest.mark.skipif(not RUN, reason="set LOFREQ_TPU_SCALE_TESTS=1")
def test_2mb_parallel_equals_single(tmp_path):
    from simulate_fast import simulate_fast

    sim = simulate_fast(str(tmp_path), genome_len=2_000_000, depth=100)
    env = dict(os.environ, PYTHONPATH=os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    outs = {}
    for threads in (1, 4):
        out = str(tmp_path / f"o{threads}.vcf")
        t0 = time.time()
        subprocess.run(
            [sys.executable, "-m", "lofreq_tpu.cli", "call-parallel",
             "--pp-threads", str(threads), "-f", sim["fa"], "-o", out,
             "-B", "-A", sim["bam"]],
            check=True, env=env, capture_output=True)
        outs[threads] = (out, time.time() - t0)
    a = [l for l in open(outs[1][0]) if not l.startswith("#")]
    b = [l for l in open(outs[4][0]) if not l.startswith("#")]
    assert a == b
    truth_pos = {t[0] for t in sim["truth"]}
    called = {int(l.split("\t")[1]) - 1 for l in a}
    assert not (called - truth_pos), "false positives at scale"
    detectable = {t[0] for t in sim["truth"]
                  if t[6] and t[5] / t[6] >= 0.02 and t[5] >= 10}
    assert detectable <= called


@pytest.mark.skipif(not RUN, reason="set LOFREQ_TPU_SCALE_TESTS=1")
def test_sharded_column_scaling_efficiency():
    """Sharded column step on the virtual CPU mesh: >=0.8 efficiency at
    2 devices (BASELINE.json target; larger meshes exceed this host's
    physical cores, see tools/scaling_bench.py header)."""
    import json

    out = subprocess.run(
        [sys.executable,
         os.path.join(os.path.dirname(__file__), "..", "tools",
                      "scaling_bench.py"), "2", "4096", "512"],
        capture_output=True, text=True, timeout=900,
        env={**os.environ, "JAX_PLATFORMS": "cpu"})
    rows = [json.loads(l) for l in out.stdout.splitlines()
            if l.startswith("{")]
    assert rows and rows[-1]["devices"] == 2, out.stdout + out.stderr
    assert rows[-1]["efficiency"] >= 0.8, rows
