"""I/O layer tests: BGZF, BAM/SAM, BAI, FASTA/FAI, VCF, BED."""

import io as _io
import os

import numpy as np
import pytest

from lofreq_tpu.io.bai import build_bai
from lofreq_tpu.io.bam import (
    BamHeader,
    BamRead,
    BamReader,
    BamWriter,
    decode_record,
    encode_record,
    read_sam,
    write_sam,
)
from lofreq_tpu.io.bed import BedIndex
from lofreq_tpu.io.bgzf import BgzfReader, BgzfWriter, is_bgzf
from lofreq_tpu.io.fasta import Fasta, write_fasta
from lofreq_tpu.io.vcf import Var, VcfReader, VcfWriter, new_header, sprintf_info


def test_bgzf_roundtrip(tmp_path):
    data = os.urandom(300_000) + b"tail"
    p = tmp_path / "x.bgz"
    with BgzfWriter(p) as w:
        for i in range(0, len(data), 7777):
            w.write(data[i : i + 7777])
    assert is_bgzf(p)
    with BgzfReader(p) as r:
        assert r.read() == data
    # virtual offset seek
    r = BgzfReader(p)
    first = r.read(100)
    voff = r.tell_virtual()
    nxt = r.read(50)
    r.seek_virtual(voff)
    assert r.read(50) == nxt
    assert first == data[:100]
    r.close()
    # gzip can read it too
    import gzip

    with gzip.open(p) as g:
        assert g.read() == data


def _mk_read(qname, tid, pos, seq, cigar, mapq=40, flag=0):
    r = BamRead()
    r.qname = qname
    r.tid = tid
    r.pos = pos
    r.seq = seq.encode()
    r.qual = np.full(len(seq), 30, dtype=np.uint8)
    r.set_cigar_string(cigar)
    r.mapq = mapq
    r.flag = flag
    r.set_tag("NM", "i", 1)
    r.set_tag("lb", "Z", "II" * (len(seq) // 2))
    return r


def test_bam_roundtrip(tmp_path):
    header = BamHeader("@HD\tVN:1.6\tSO:coordinate\n", [("chr1", 10000), ("chr2", 5000)])
    reads = [
        _mk_read("r1", 0, 100, "ACGTACGTAC", "10M"),
        _mk_read("r2", 0, 200, "ACGTAACGTA", "4M2I4M"),
        _mk_read("r3", 1, 50, "GGGGCCCCAA", "5M2D5M", flag=16),
    ]
    p = tmp_path / "t.bam"
    with BamWriter(p, header) as w:
        for r in reads:
            w.write(r)
    rd = BamReader(p)
    assert rd.header.references == header.references
    got = list(rd)
    assert len(got) == 3
    for a, b in zip(reads, got):
        assert a.qname == b.qname
        assert a.pos == b.pos
        assert a.seq == b.seq
        assert a.cigar_string() == b.cigar_string()
        assert np.array_equal(a.qual, b.qual)
        assert b.get_tag("NM") == 1
        assert b.get_tag("lb") == a.get_tag("lb")
    assert got[2].is_reverse
    assert got[1].endpos() == 208
    rd.close()
    # binary encode/decode roundtrip
    raw = encode_record(reads[1])
    back = decode_record(raw[4:])
    assert back.qname == "r2" and back.cigar_string() == "4M2I4M"


def test_bai_fetch(tmp_path):
    header = BamHeader("", [("c1", 1 << 20)])
    reads = [
        _mk_read(f"r{i}", 0, 1000 * i, "ACGTACGTAC", "10M") for i in range(200)
    ]
    p = tmp_path / "big.bam"
    with BamWriter(p, header) as w:
        for r in reads:
            w.write(r)
    build_bai(p)
    assert os.path.exists(str(p) + ".bai")
    rd = BamReader(p)
    got = list(rd.fetch("c1", 50_000, 60_000))
    want = [r for r in reads if r.pos < 60_000 and r.pos + 10 > 50_000]
    assert [r.qname for r in got] == [r.qname for r in want]
    # full-scan fallback agrees
    os.remove(str(p) + ".bai")
    rd2 = BamReader(p)
    got2 = list(rd2.fetch("c1", 50_000, 60_000))
    assert [r.qname for r in got2] == [r.qname for r in want]


def test_sam_roundtrip(tmp_path):
    header = BamHeader("@HD\tVN:1.6\n", [("chr1", 10000)])
    reads = [_mk_read("r1", 0, 99, "ACGTACGTAC", "10M")]
    p = tmp_path / "t.sam"
    write_sam(p, header, reads)
    h2, got = read_sam(p)
    assert h2.references == [("chr1", 10000)]
    assert got[0].qname == "r1"
    assert got[0].pos == 99
    assert got[0].get_tag("NM") == 1


def test_fasta_fai(tmp_path):
    p = tmp_path / "ref.fa"
    seqs = {"chr1": "acgt" * 100, "chr2": "GGCC" * 33 + "A"}
    write_fasta(p, seqs, width=50)
    fa = Fasta(p)
    assert fa.references == ["chr1", "chr2"]
    assert fa.length("chr1") == 400
    assert fa.fetch("chr1") == b"ACGT" * 100  # uppercased
    assert fa.fetch("chr2") == b"GGCC" * 33 + b"A"
    assert os.path.exists(str(p) + ".fai")


def test_vcf_formats(tmp_path):
    info = sprintf_info(1386, 0.051948, 40, (557, 756, 37, 35), 0, 3, 0, 71)
    assert info == "DP=1386;AF=0.051948;SB=40;DP4=557,756,37,35;HQA=71"
    info2 = sprintf_info(100, 0.25, 0, (30, 30, 20, 20), 1, 4, 0, 0)
    assert info2 == "DP=100;AF=0.250000;SB=0;DP4=30,30,20,20;INDEL;HRUN=4"
    v = Var(chrom="chr1", pos=99, ref="A", alt="G", qual=57, info=info)
    assert v.to_line() == "chr1\t100\t.\tA\tG\t57\t.\t" + info
    assert not v.is_indel()
    found, af = v.info_value("AF")
    assert found and af == "0.051948"
    assert v.dp4() == (557, 756, 37, 35)

    hdr = new_header("lofreq call test", "ref.fa", file_date="20260816")
    p = tmp_path / "t.vcf.gz"
    with VcfWriter(p, hdr) as w:
        w.write(v)
    with VcfReader(p) as r:
        assert "##fileformat=VCFv4.0" in r.header
        assert "##source=lofreq call test" in r.header
        got = list(r)
    assert len(got) == 1
    assert got[0].pos == 99 and got[0].qual == 57
    assert got[0].info == info

    vi = Var(chrom="c", pos=1, ref="AT", alt="A", info="INDEL")
    assert vi.is_indel()
    # filter handling
    v.add_filter("min_dp_10")
    v.add_filter("sb_fdr")
    assert v.filter == "min_dp_10;sb_fdr"
    assert not v.passes()


def test_bed(tmp_path):
    p = tmp_path / "r.bed"
    p.write_text("chr1\t100\t200\nchr1\t500\t600\nchr2\t0\t50\n")
    bed = BedIndex.read(p)
    assert bed.overlap("chr1", 150, 151)
    assert bed.overlap("chr1", 199, 300)
    assert not bed.overlap("chr1", 200, 500)
    assert not bed.overlap("chr3", 0, 1000)
    mask = bed.overlap_mask("chr1", np.array([99, 100, 199, 200, 550]))
    assert mask.tolist() == [False, True, True, False, True]
    assert bed.num_regions() == 3
    assert bed.total_length() == 250
    # 2-column position list
    p2 = tmp_path / "pos.bed"
    p2.write_text("chr1\t100\n")
    bed2 = BedIndex.read(p2)
    assert bed2.overlap("chr1", 99, 100)
    assert not bed2.overlap("chr1", 100, 101)
