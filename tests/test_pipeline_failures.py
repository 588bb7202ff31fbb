"""Failure propagation through the pipelined call engine.

The window pipeline runs a raw prefetcher thread, sweep workers and a
confirm executor; an IO failure anywhere must surface as a prompt
exception in the caller (SURVEY §5 failure-detection contract), never a
hang or a silent truncation.
"""

import os
import sys
import time

import pytest

sys.path.insert(0, os.path.dirname(__file__))


@pytest.fixture()
def art(tmp_path):
    from simulate_fast import simulate_fast

    return simulate_fast(str(tmp_path), genome_len=40_000, depth=120,
                         seed=21)


def _run(art):
    from lofreq_tpu.call.caller import VarcallConf
    from lofreq_tpu.pipelines.call_pipeline import run_call

    return run_call(art["bam"], art["fa"], vconf=VarcallConf(
        use_device_screen=False, use_device_baq=False))


def test_truncated_bam_raises_promptly(art, tmp_path):
    import threading

    from lofreq_tpu.io import bgzf as B

    good = _run(art)
    assert len(good.vars) >= 0
    # truncate the BAM mid-stream (keep the header region intact)
    data = open(art["bam"], "rb").read()
    bad = str(tmp_path / "trunc.bam")
    with open(bad, "wb") as fh:
        fh.write(data[: len(data) // 2])
    # reuse the original .bai so region queries point past the cut
    open(bad + ".bai", "wb").write(open(art["bam"] + ".bai", "rb").read())
    B._SPAN_CACHE.clear()
    t0 = time.time()
    from lofreq_tpu.call.caller import VarcallConf
    from lofreq_tpu.pipelines.call_pipeline import run_call

    with pytest.raises(Exception):
        run_call(bad, art["fa"], vconf=VarcallConf(
            use_device_screen=False, use_device_baq=False))
    assert time.time() - t0 < 60, "failure took too long to surface"
    # no leaked prefetcher threads spinning on the dead file
    time.sleep(0.2)
    spinning = [t for t in threading.enumerate()
                if t.name == "raw-prefetch" and t.is_alive()]
    assert not spinning


def test_missing_reference_contig_raises(art, tmp_path):
    from lofreq_tpu.call.caller import VarcallConf
    from lofreq_tpu.pipelines.call_pipeline import run_call

    fa = str(tmp_path / "other.fa")
    with open(fa, "w") as fh:
        fh.write(">other\nACGT\n")
    from lofreq_tpu.cli import main

    assert main(["faidx", fa]) == 0
    with pytest.raises(Exception):
        run_call(art["bam"], fa, vconf=VarcallConf(
            use_device_screen=False, use_device_baq=False))
