"""Round-2 fix regressions: grouped median vectorization, native thread
sweep determinism (csrc/columns.c + csrc/baq.c striping)."""

import os

import numpy as np
import pytest

from lofreq_tpu.call.caller import VarcallConf, grouped_int_median
from lofreq_tpu.pileup.engine import PileupConf
from lofreq_tpu.pipelines.call_pipeline import run_call
from simulate import simulate


def _naive_int_median(vals):
    """int_median reference semantics (utils.c:436-462)."""
    vals = np.sort(vals)
    n = len(vals)
    if n == 0:
        return -1
    if n % 2 == 0:
        return int((int(vals[n // 2]) + int(vals[n // 2 - 1])) / 2.0)
    return int(vals[n // 2])


def test_grouped_int_median_matches_naive():
    rng = np.random.default_rng(42)
    for trial in range(20):
        n_groups = int(rng.integers(1, 30))
        n = int(rng.integers(0, 200))
        group = rng.integers(0, n_groups, size=n).astype(np.int64)
        vals = rng.integers(0, 94, size=n).astype(np.int64)
        got = grouped_int_median(vals, group, n_groups)
        for g in range(n_groups):
            assert got[g] == _naive_int_median(vals[group == g]), (
                trial, g)


def test_grouped_int_median_empty():
    got = grouped_int_median(np.zeros(0, dtype=np.int64),
                             np.zeros(0, dtype=np.int64), 4)
    assert (got == -1).all()


@pytest.fixture(scope="module")
def sim(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("r2sim")
    return simulate(str(tmp), genome_len=4000, depth=300, seed=77)


def test_def_alt_bq_median_call(sim):
    """-R -1 path: runs end-to-end and produces a sane (subset-ish) call
    set; medians replace alt BQs so calls may shift but never crash."""
    vconf = VarcallConf(use_baq=False, use_idaq=False, def_alt_bq=-1)
    pconf = PileupConf(use_baq=False, use_idaq=False)
    res = run_call(sim["bam"], sim["fa"], vconf=vconf, pconf=pconf)
    assert res.stats.num_snv_tests > 0
    for v in res.vars:
        assert v.qual >= 0


def _call_with_threads(sim, n):
    prev = os.environ.get("LOFREQ_NATIVE_THREADS")
    os.environ["LOFREQ_NATIVE_THREADS"] = str(n)
    try:
        vconf = VarcallConf(use_baq=True, use_idaq=True, no_indels=False)
        pconf = PileupConf(use_baq=True, use_idaq=True)
        res = run_call(sim["bam"], sim["fa"], vconf=vconf, pconf=pconf)
        return [(v.chrom, v.pos, v.ref, v.alt, v.qual, v.info)
                for v in res.vars], (res.stats.num_snv_tests,
                                     res.stats.num_indel_tests)
    finally:
        if prev is None:
            os.environ.pop("LOFREQ_NATIVE_THREADS", None)
        else:
            os.environ["LOFREQ_NATIVE_THREADS"] = prev


def test_native_threads_determinism(sim):
    """LOFREQ_NATIVE_THREADS sweep: the pthread striping in csrc/columns.c
    and csrc/baq.c must be bit-deterministic vs serial."""
    v1, s1 = _call_with_threads(sim, 1)
    for n in (2, 8):
        vn, sn = _call_with_threads(sim, n)
        assert vn == v1, f"threads={n} differs from serial"
        assert sn == s1
