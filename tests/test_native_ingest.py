"""Native ingest engine consistency: C path rows/calls == Python path."""

import numpy as np
import pytest

from lofreq_tpu.call.caller import VarcallConf
from lofreq_tpu.io.bam import BamReader
from lofreq_tpu.io.fasta import Fasta
from lofreq_tpu.pileup.engine import PileupConf, rows_from_reads, read_passes_filters
from lofreq_tpu.pileup.native_ingest import ingest_region
from lofreq_tpu.pipelines.call_pipeline import run_call
from simulate import simulate


@pytest.fixture(scope="module")
def sim(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("nat")
    return simulate(str(tmp), genome_len=4000, depth=300, seed=31,
                    snvs=((0.1, 2), (0.5, 2)),
                    indels=((0.3, 1, 2, "ins"), (0.3, 1, 3, "del")))


@pytest.mark.parametrize("use_baq,use_sq", [(False, False), (True, False),
                                            (False, True), (True, True)])
def test_rows_match_python(sim, use_baq, use_sq):
    pconf = PileupConf(use_baq=use_baq, use_idaq=use_baq, use_sq=use_sq)
    fa = Fasta(sim["fa"])
    ref = fa.fetch(sim["chrom"])
    rdr = BamReader(sim["bam"])
    native = ingest_region(rdr, pconf, ref, 0)

    # python path: same reads, tags attached the same way
    rdr2 = BamReader(sim["bam"])
    reads = [r for r in rdr2.fetch(sim["chrom"])
             if read_passes_filters(r, pconf, sim["chrom"])]
    for r in reads:
        r.mapq = min(r.mapq, pconf.max_mq)
    if use_baq:
        from lofreq_tpu.ops.baq import add_alnqual_tags

        add_alnqual_tags(reads, ref, baq=True, ext_baq=pconf.ext_baq,
                         idaq=pconf.use_idaq)
    if use_sq:
        from lofreq_tpu.pileup.sourcequal import compute_source_quals

        compute_source_quals(reads, ref, pconf.def_nm_q)
    py = rows_from_reads(reads, pconf)

    # row multisets must match; native rows are ordered by read, python's
    # fast path groups reads, so compare after a stable global sort
    def canon(rows):
        key = np.lexsort((
            rows.daq, rows.iaq, rows.dq, rows.iq, rows.indel, rows.sq,
            rows.mq, rows.baq, rows.strand, rows.bq, rows.nt4, rows.is_del,
            rows.pos,
        ))
        return key

    nk = canon(native)
    pk = canon(py)
    assert len(nk) == len(pk)
    for field in ("pos", "nt4", "bq", "baq", "mq", "sq", "strand", "is_del",
                  "is_refskip", "indel", "iq", "dq", "iaq", "daq"):
        a = getattr(native, field)[nk]
        b = getattr(py, field)[pk]
        if not np.array_equal(a, b):
            bad = np.nonzero(a != b)[0][:5]
            raise AssertionError(
                f"{field} mismatch at {bad}: native={a[bad]} py={b[bad]} "
                f"pos={native.pos[nk][bad]}")
    assert int(native.is_head.sum()) == int(py.is_head.sum())
    assert int(native.is_tail.sum()) == int(py.is_tail.sum())


def test_calls_match_python(sim, tmp_path):
    for call_indels in (False, True):
        vk = dict(use_baq=True, use_idaq=call_indels,
                  no_indels=not call_indels)
        pk = dict(use_baq=True, use_idaq=call_indels,
                  collect_indels=call_indels)
        res_n = run_call(sim["bam"], sim["fa"], vconf=VarcallConf(**vk),
                         pconf=PileupConf(**pk), native=True)
        res_p = run_call(sim["bam"], sim["fa"], vconf=VarcallConf(**vk),
                         pconf=PileupConf(**pk), native=False)
        a = [v.to_line() for v in res_n.vars]
        b = [v.to_line() for v in res_p.vars]
        assert a == b, f"call_indels={call_indels}"
        assert res_n.stats.num_snv_tests == res_p.stats.num_snv_tests
        assert res_n.stats.num_indel_tests == res_p.stats.num_indel_tests


def test_region_ingest(sim):
    pconf = PileupConf(use_baq=False, use_idaq=False)
    fa = Fasta(sim["fa"])
    ref = fa.fetch(sim["chrom"])
    rdr = BamReader(sim["bam"])
    rows = ingest_region(rdr, pconf, ref, 0, beg=1000, end=1500)
    assert len(rows.pos)
    # only reads overlapping the region contribute rows
    assert rows.pos.min() >= 1000 - 110
    assert rows.pos.max() < 1500 + 110


def test_fused_columns_match(sim):
    """The fused C column builder yields identical calls to the generic
    path on the SNV-only configuration."""
    vk = dict(use_baq=True, use_idaq=False)
    res_fused = run_call(sim["bam"], sim["fa"], vconf=VarcallConf(**vk),
                         pconf=PileupConf(use_baq=True, use_idaq=False,
                                          collect_indels=False), native=True)
    res_py = run_call(sim["bam"], sim["fa"], vconf=VarcallConf(**vk),
                      pconf=PileupConf(use_baq=True, use_idaq=False,
                                       collect_indels=False), native=False)
    assert [v.to_line() for v in res_fused.vars] == \
        [v.to_line() for v in res_py.vars]
    assert res_fused.stats.num_snv_tests == res_py.stats.num_snv_tests


def test_read_flag_filters(tmp_path):
    """Secondary/qcfail/dup/unmapped/orphan reads are excluded in both
    ingest paths; max_depth caps column coverage."""
    from lofreq_tpu.io.bai import build_bai
    from lofreq_tpu.io.bam import (
        BamHeader, BamRead, BamWriter, FDUP, FPAIRED, FQCFAIL, FSECONDARY,
        FUNMAP,
    )

    genome = b"ACGT" * 100
    header = BamHeader("@HD\tVN:1.6\tSO:coordinate\n", [("c", 400)])
    flags = [0, FSECONDARY, FQCFAIL, FDUP, FUNMAP, FPAIRED,  # orphan
             FPAIRED | 0x2, 0, 0, 0]
    path = str(tmp_path / "f.bam")
    with BamWriter(path, header) as w:
        for i, fl in enumerate(flags):
            r = BamRead()
            r.qname = f"f{i}"
            r.tid = -1 if fl & FUNMAP else 0
            r.pos = 100
            r.seq = genome[100:150]
            r.qual = np.full(50, 30, dtype=np.uint8)
            r.set_cigar_string("50M")
            r.flag = fl
            r.mapq = 60
            w.write(r)
    build_bai(path)
    pconf = PileupConf(use_baq=False, use_idaq=False)
    rdr = BamReader(path)
    rows = ingest_region(rdr, pconf, genome, 0)
    # kept: flags 0, proper-pair, 0, 0 -> 5 reads? (0, pp, 0, 0, 0)
    n_reads = len(rows.pos) // 50
    assert n_reads == 5
    # python path agrees
    rdr2 = BamReader(path)
    kept = [r for r in rdr2.fetch("c")
            if read_passes_filters(r, pconf, "c")]
    assert len(kept) == 5

    # max_depth cap via the fused builder
    from lofreq_tpu.call.caller import VarcallConf
    from lofreq_tpu.pileup.fast_columns import build_snv_batch

    pconf2 = PileupConf(use_baq=False, use_idaq=False, max_depth=3)
    rows2 = ingest_region(BamReader(path), pconf2, genome, 0)
    batch = build_snv_batch(rows2, rows2.raw_flags, 0, 400, genome, "c",
                            pconf2, VarcallConf(use_baq=False))
    assert int(batch.coverage_plp.max()) == 3


def test_native_ign_vcf_source_qual_matches_python(tmp_path):
    """Native source-qual with an ignore list == Python path (-S vcf +
    -s): known variant positions contribute no mismatch evidence."""
    import os
    import sys
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from simulate import simulate

    from lofreq_tpu.call.caller import VarcallConf
    from lofreq_tpu.pileup.engine import PileupConf
    from lofreq_tpu.pipelines.call_pipeline import run_call

    sim = simulate(str(tmp_path), genome_len=2500, depth=250, seed=13)
    # ignore the first half of the truth variants
    ign = {"sim1": {t[0] for t in sim["truth"][: len(sim["truth"]) // 2]}}
    vconf = VarcallConf(use_sq=True, use_baq=False, use_idaq=False)
    pconf = PileupConf(use_sq=True, use_baq=False, use_idaq=False)
    a = run_call(sim["bam"], sim["fa"], vconf=vconf, pconf=pconf,
                 ign_pos=ign, native=True)
    b = run_call(sim["bam"], sim["fa"], vconf=vconf, pconf=pconf,
                 ign_pos=ign, native=False)
    la = [(v.chrom, v.pos, v.ref, v.alt, v.qual, v.info) for v in a.vars]
    lb = [(v.chrom, v.pos, v.ref, v.alt, v.qual, v.info) for v in b.vars]
    assert la == lb
    assert a.stats.num_snv_tests == b.stats.num_snv_tests
    # the ignore list must actually change results vs no list
    c = run_call(sim["bam"], sim["fa"], vconf=vconf, pconf=pconf,
                 native=True)
    lc = [(v.chrom, v.pos, v.ref, v.alt, v.qual, v.info) for v in c.vars]
    assert la != lc
