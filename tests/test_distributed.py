"""Distributed helpers on the virtual CPU mesh."""

import numpy as np

from lofreq_tpu.parallel.distributed import (
    allreduce_counters,
    global_mesh,
    host_region_assignment,
    run_distributed_call,
)


def test_allreduce_counters():
    out = allreduce_counters({"snv": 123, "indel": 7})
    assert out == {"snv": 123, "indel": 7}


def test_host_region_assignment():
    bins = [("c", i * 10, (i + 1) * 10) for i in range(7)]
    a0 = host_region_assignment(bins, 2, 0)
    a1 = host_region_assignment(bins, 2, 1)
    assert sorted(a0 + a1) == sorted(bins)
    assert a0 == sorted(a0, key=lambda b: b[1])


def test_run_distributed_call_single_process(tmp_path):
    import sys

    sys.path.insert(0, "tests")
    from simulate import simulate

    sim = simulate(str(tmp_path), genome_len=2000, depth=200, seed=9,
                   snvs=((0.5, 2),))
    vk = dict(use_baq=False, use_idaq=False)
    pk = dict(use_baq=False, use_idaq=False, collect_indels=False)
    res = run_distributed_call(sim["bam"], sim["fa"], vk, pk,
                               str(tmp_path / "dist"))
    assert res["num_snv_tests"] > 0
    lines = open(res["shard"]).read().splitlines()
    assert res["n_local_vars"] == len(lines)
    called = {int(l.split("\t")[1]) - 1 for l in lines}
    truth = {t[0] for t in sim["truth"]}
    assert truth <= called


def test_call_distributed_single_process(tmp_path):
    """call-distributed (1-process degenerate case) == plain call."""
    import os
    import sys
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from simulate import simulate

    from lofreq_tpu.cli import main

    sim = simulate(str(tmp_path), genome_len=3000, depth=200, seed=31)
    plain = str(tmp_path / "plain.vcf")
    dist = str(tmp_path / "dist.vcf")
    assert main(["call", "-f", sim["fa"], "-o", plain, sim["bam"]]) == 0
    assert main(["call-distributed", "-f", sim["fa"], "-o", dist,
                 sim["bam"]]) == 0
    a = [l for l in open(plain) if not l.startswith("#")]
    b = [l for l in open(dist) if not l.startswith("#")]
    assert a == b


def test_call_distributed_two_processes(tmp_path):
    """Real 2-process jax.distributed run == single-process call (opt-in:
    spawns subprocesses + a coordinator port)."""
    import os
    import subprocess
    import sys

    if not os.environ.get("LOFREQ_TPU_SCALE_TESTS"):
        import pytest

        pytest.skip("set LOFREQ_TPU_SCALE_TESTS=1 to run")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from simulate import simulate

    sim = simulate(str(tmp_path), genome_len=4000, depth=200, seed=8)
    out = str(tmp_path / "d2.vcf")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, PYTHONPATH=repo, JAX_PLATFORMS="cpu",
               LOFREQ_NATIVE_THREADS="1")
    import socket

    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    procs = [subprocess.Popen(
        [sys.executable, "-m", "lofreq_tpu.cli", "call-distributed",
         "--num-processes", "2", "--process-id", str(pid),
         "--coordinator", f"127.0.0.1:{port}",
         "-f", sim["fa"], "-o", out, "-B", "-A", sim["bam"]],
        env=env, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
        for pid in (0, 1)]
    for p in procs:
        assert p.wait(timeout=240) == 0
    single = str(tmp_path / "s.vcf")
    from lofreq_tpu.cli import main

    assert main(["call", "-f", sim["fa"], "-o", single, "-B", "-A",
                 sim["bam"]]) == 0
    a = [l for l in open(out) if not l.startswith("##")]
    b = [l for l in open(single) if not l.startswith("##")]
    assert a == b
