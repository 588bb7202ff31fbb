"""Device-BAQ screening mode: the f32 device read-rescoring + deflated
screen + exact C confirmation must reproduce the all-exact call VCF
byte-identically (caller.py:confirm_snv_candidates; kprobaln_ext.c:80 is
the original kernel both paths re-derive from)."""

import numpy as np
import pytest

from simulate import simulate

from lofreq_tpu.call.caller import VarcallConf
from lofreq_tpu.pipelines.call_pipeline import run_call


def _vars_key(vs):
    return [(v.pos, v.ref, v.alt, v.qual, v.info) for v in vs]


def _run_both(art, **kw):
    exact = run_call(
        art["bam"], art["fa"],
        vconf=VarcallConf(use_device_screen=False, use_device_baq=False),
        **kw)
    dev = run_call(
        art["bam"], art["fa"],
        vconf=VarcallConf(use_device_screen=True, use_device_baq=True),
        **kw)
    return exact, dev


def test_device_baq_identity_snv_only(tmp_path):
    art = simulate(str(tmp_path), genome_len=25000, depth=90, seed=23)
    exact, dev = _run_both(art)
    assert len(exact.vars) > 5
    assert _vars_key(exact.vars) == _vars_key(dev.vars)
    assert exact.stats.num_snv_tests == dev.stats.num_snv_tests


def test_device_baq_identity_with_indel_reads(tmp_path):
    # reads with I/D cigar ops are device-ineligible and take the exact C
    # BAQ path inside the same fill; the merged stream must stay identical
    art = simulate(
        str(tmp_path), genome_len=20000, depth=80, seed=5,
        indels=((0.5, 2, 3, "ins"), (0.4, 2, 4, "del")),
    )
    exact, dev = _run_both(art)
    assert _vars_key(exact.vars) == _vars_key(dev.vars)
    assert exact.stats.num_snv_tests == dev.stats.num_snv_tests


def test_device_baq_identity_region(tmp_path):
    art = simulate(str(tmp_path), genome_len=20000, depth=70, seed=9)
    exact, dev = _run_both(art, region=f"{art['chrom']}:2001-15000")
    assert _vars_key(exact.vars) == _vars_key(dev.vars)


def test_device_baq_identity_call_indels(tmp_path):
    """--call-indels (the reference best-practice configuration,
    snakemake/Snakefile:124-144) keeps the device BAQ engine: indel err
    probs never see the approximation (IDAQ stays exact-C in the same
    ingest fill), SNV candidates are exactly confirmed, and the merged
    emission order (indels before SNVs at one position,
    lofreq_call.c:887) must match the all-exact path on the full
    interleaved var list."""
    from lofreq_tpu.pileup.engine import PileupConf

    art = simulate(
        str(tmp_path), genome_len=20000, depth=80, seed=3,
        indels=((0.5, 2, 3, "ins"), (0.4, 2, 4, "del")),
    )
    # BI/BD tags via the dindel model (the reference's prescribed indel
    # preprocessing) so the planted indels reach significance
    from lofreq_tpu.io.bai import build_bai
    from lofreq_tpu.pipelines.indelqual import run_indelqual

    iq_bam = str(tmp_path / "iq.bam")
    run_indelqual(art["bam"], iq_bam, dindel=True, ref_path=art["fa"])
    build_bai(iq_bam)
    art["bam"] = iq_bam
    vkw = dict(no_indels=False)
    exact = run_call(
        art["bam"], art["fa"],
        vconf=VarcallConf(use_device_screen=False, use_device_baq=False,
                          **vkw),
        pconf=PileupConf(collect_indels=True, use_idaq=True))
    dev_conf = VarcallConf(use_device_screen=True, use_device_baq=True,
                           **vkw)
    assert dev_conf.device_baq_on(PileupConf(collect_indels=True))
    dev = run_call(
        art["bam"], art["fa"], vconf=dev_conf,
        pconf=PileupConf(collect_indels=True, use_idaq=True))
    assert any("INDEL" in (v.info or "") for v in exact.vars)
    assert _vars_key(exact.vars) == _vars_key(dev.vars)
    assert exact.stats.num_snv_tests == dev.stats.num_snv_tests
    assert exact.stats.num_indel_tests == dev.stats.num_indel_tests


def test_extract_reads_eligibility(tmp_path):
    """lfq_extract_reads: M-only reads at the mode length are eligible;
    indel/clip cigars and off-length reads are not."""
    import ctypes

    from lofreq_tpu.io.bam import BamReader
    from lofreq_tpu.pileup.engine import PileupConf
    from lofreq_tpu.pileup.native_ingest import (
        _conf_struct, get_lib, raw_records_for_region)

    art = simulate(str(tmp_path), genome_len=15000, depth=40, seed=13,
                   indels=((0.5, 1, 3, "ins"),))
    rdr = BamReader(art["bam"])
    raw = raw_records_for_region(rdr, 0, 0, 15000)
    conf = PileupConf()
    cs = _conf_struct(conf, 0, 0, 15000)
    lib = get_lib()
    buf = np.frombuffer(raw, dtype=np.uint8)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    bufp = buf.ctypes.data_as(u8p)
    counts = np.zeros(5, dtype=np.int64)
    lib.lfq_ingest_count(bufp, ctypes.c_int64(len(raw)), ctypes.byref(cs),
                         counts.ctypes.data_as(
                             ctypes.POINTER(ctypes.c_int64)))
    n = int(counts[0])
    L = lib.lfq_mode_read_len(bufp, ctypes.c_int64(len(raw)),
                              ctypes.byref(cs))
    assert L == 100
    elig = np.zeros(n, np.uint8)
    pos = np.empty(n, np.int64)
    lq = np.empty(n, np.int32)
    codes = np.empty((n, L), np.uint8)
    quals = np.empty((n, L), np.uint8)
    xb = np.empty(n, np.int64)
    xe = np.empty(n, np.int64)
    lib.lfq_extract_reads.restype = ctypes.c_int64
    k = lib.lfq_extract_reads(
        bufp, ctypes.c_int64(len(raw)), ctypes.byref(cs),
        ctypes.c_int64(15000), ctypes.c_int32(L),
        elig.ctypes.data_as(u8p),
        pos.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        lq.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        codes.ctypes.data_as(u8p), quals.ctypes.data_as(u8p),
        xb.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        xe.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    assert k == n
    idx = np.nonzero(elig)[0]
    assert len(idx) > 0.5 * n          # most reads are plain M
    assert len(idx) < n                # indel-cigar reads are excluded
    # windows: pos-3 .. pos+L+3 clamped (realn_one, baq.c:422-438)
    assert np.all(xb[idx] == np.maximum(pos[idx] - 3, 0))
    assert np.all(xe[idx] == np.minimum(pos[idx] + L + 3, 15000))
    # codes decode correctly against the planted genome
    genome = np.frombuffer(art["genome"], np.uint8) \
        if isinstance(art.get("genome"), (bytes, bytearray)) else None
    assert codes[idx].max() <= 4
    assert quals[idx].min() >= 2


def test_conf_reuse_after_screening_run(tmp_path):
    """A conf object that engaged the no-BAQ screening engine must not
    leak baq_screen_null into a later run whose gates fail (e.g. a BED
    run): that would drop BAQ from the merge with no exact confirm."""
    from lofreq_tpu.io.bed import BedIndex

    art = simulate(str(tmp_path), genome_len=12000, depth=60, seed=21)
    bed = tmp_path / "t.bed"
    bed.write_text(f"{art['chrom']}\t1000\t9000\n")
    conf = VarcallConf()
    run_call(art["bam"], art["fa"], vconf=conf)  # engages screening
    # the dynamic-Bonferroni counters legitimately accumulate on a
    # reused conf (the reference struct does too); reset them so the
    # comparison isolates the baq_screen_null leak
    conf.bonf_subst = 1
    conf.bonf_indel = 1
    reused = run_call(art["bam"], art["fa"], vconf=conf,
                      bed=BedIndex.read(str(bed)))
    fresh = run_call(art["bam"], art["fa"], vconf=VarcallConf(),
                     bed=BedIndex.read(str(bed)))
    assert _vars_key(reused.vars) == _vars_key(fresh.vars)
    assert len(fresh.vars) > 0
