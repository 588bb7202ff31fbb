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


@pytest.mark.skipif(not RUN, reason="set LOFREQ_TPU_SCALE_TESTS=1")
def test_pseudoclonal_deep_subpercent(tmp_path):
    """denv2-pseudoclonal-shaped oracle (BASELINE.md rows 1-2): a 10.7 kb
    genome at 2000x with variants down to 0.5% AF — 0 false positives,
    every detectable planted SNV recovered, DEFAULT engine config (BAQ on,
    device screen per backend)."""
    from simulate import simulate

    from lofreq_tpu.call.caller import VarcallConf
    from lofreq_tpu.pipelines.call_pipeline import call_and_filter

    art = simulate(str(tmp_path), genome_len=10700, depth=2000, seed=42,
                   snvs=((0.005, 12), (0.01, 12), (0.05, 12), (0.5, 12)))
    out = str(tmp_path / "out.vcf")
    res = call_and_filter(art["bam"], art["fa"], out,
                          vconf=VarcallConf())
    got = {(v.pos, v.ref, v.alt) for v in res.vars if not v.is_indel()}
    truth = {(pos, ref, alt) for pos, ref, alt, af, kind, cnt, dp
             in art["truth"] if kind == "snv"}
    truth_pos = {t[0] for t in truth}
    fps = [c for c in got if c not in truth and c[0] not in truth_pos]
    assert not fps, f"false positives: {sorted(fps)[:10]}"
    want = {(pos, ref, alt) for pos, ref, alt, af, kind, cnt, dp
            in art["truth"] if kind == "snv" and dp
            and cnt / dp >= 0.005 and cnt >= 10}
    missed = want - got
    assert not missed, f"missed: {sorted(missed)}"
    assert len(want) >= 30  # sub-percent calls actually exercised
