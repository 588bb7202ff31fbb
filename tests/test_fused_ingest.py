"""Fused ingest->columns (csrc/ingest.c:lfq_ingest_columns) vs the
two-pass row path (lfq_ingest_fill + lfq_build_columns): identical
batches and identical call output, including indel-cigar reads, depth
capping and the consensus-indel fallback."""

import numpy as np
import pytest

from simulate import simulate

from lofreq_tpu.call.caller import VarcallConf
from lofreq_tpu.io.bam import BamReader
from lofreq_tpu.pileup.engine import PileupConf
from lofreq_tpu.pileup.fast_columns import (build_snv_batch,
                                            build_snv_batch_fused)
from lofreq_tpu.pileup.native_ingest import ingest_region
from lofreq_tpu.pipelines.call_pipeline import run_call


def _ref(art):
    with open(art["fa"]) as fh:
        return "".join(l.strip() for l in fh
                       if not l.startswith(">")).encode()


def _batches(art, pconf, vconf, beg, end):
    rdr = BamReader(art["bam"])
    ref = _ref(art)
    rows = ingest_region(rdr, pconf, ref, 0, beg=beg, end=end)
    want = build_snv_batch(rows, rows.raw_flags, beg, end, ref,
                           art["chrom"], pconf, vconf)
    got, ok = build_snv_batch_fused(rdr, ref, art["chrom"], 0, beg, end,
                                    pconf, vconf)
    return want, got, ok


FIELDS = ("positions", "ref_nt4", "coverage_plp", "num_bases", "num_heads",
          "num_tails", "fw_counts", "rv_counts", "cons_nt4", "num_ins",
          "num_dels", "num_non_indels", "num_ign_indels")


def _assert_equal(want, got):
    for f in FIELDS:
        np.testing.assert_array_equal(np.asarray(getattr(got, f)),
                                      np.asarray(getattr(want, f)),
                                      err_msg=f)
    for k in ("starts", "depths", "alt_counts", "alt_raw_counts",
              "alt_nt", "flat_probs"):
        np.testing.assert_array_equal(np.asarray(got.ep[k]),
                                      np.asarray(want.ep[k]), err_msg=k)


def test_fused_ingest_matches_row_path_with_indel_reads(tmp_path):
    art = simulate(str(tmp_path), genome_len=20000, depth=70, seed=7,
                   indels=((0.5, 3, 3, "ins"), (0.4, 3, 4, "del")))
    pconf = PileupConf()
    vconf = VarcallConf()
    want, got, ok = _batches(art, pconf, vconf, 0, 20000)
    assert got is not None or not ok
    if ok:
        _assert_equal(want, got)


def test_fused_ingest_matches_row_path_max_depth(tmp_path):
    art = simulate(str(tmp_path), genome_len=8000, depth=120, seed=3)
    pconf = PileupConf(max_depth=40)
    vconf = VarcallConf()
    want, got, ok = _batches(art, pconf, vconf, 0, 8000)
    assert ok and got is not None
    _assert_equal(want, got)
    assert int(np.max(got.coverage_plp)) <= 40


def test_fused_ingest_window_subsets(tmp_path):
    art = simulate(str(tmp_path), genome_len=12000, depth=50, seed=19)
    pconf = PileupConf()
    vconf = VarcallConf()
    for beg, end in ((0, 5000), (4999, 7001), (11000, 12000)):
        want, got, ok = _batches(art, pconf, vconf, beg, end)
        assert ok
        if want is None:
            assert got is None
            continue
        _assert_equal(want, got)


def test_run_call_fused_equals_row_path(tmp_path, monkeypatch):
    """Whole-pipeline equality: the fused window path must produce the
    same variants/test counts as the pre-fusion row path."""
    art = simulate(str(tmp_path), genome_len=30000, depth=80, seed=23,
                   indels=((0.5, 4, 2, "ins"),))
    vc = dict(use_device_screen=False, use_device_baq=False)
    res_fused = run_call(art["bam"], art["fa"], vconf=VarcallConf(**vc))

    import lofreq_tpu.pipelines.call_pipeline as cp

    def no_fused(*a, **kw):
        return None, False  # forces the row-path fallback every window

    monkeypatch.setattr(cp, "_native_window_batches",
                        cp._native_window_batches)
    from lofreq_tpu.pileup import fast_columns

    monkeypatch.setattr(fast_columns, "build_snv_batch_fused", no_fused)
    res_row = run_call(art["bam"], art["fa"], vconf=VarcallConf(**vc))
    k = lambda vs: [(v.pos, v.ref, v.alt, v.qual, v.info) for v in vs]
    assert k(res_fused.vars) == k(res_row.vars)
    assert res_fused.stats.num_snv_tests == res_row.stats.num_snv_tests
    assert len(res_fused.vars) > 0
