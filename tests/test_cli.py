"""CLI subcommand tests (in-process main() invocation)."""

import gzip
import os

import numpy as np
import pytest

from lofreq_tpu.cli import main
from lofreq_tpu.io.bam import BamReader
from lofreq_tpu.io.vcf import VcfReader
from simulate import simulate


@pytest.fixture(scope="module")
def sim(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("clisim")
    return simulate(str(tmp), genome_len=3000, depth=300, seed=23,
                    snvs=((0.1, 3), (0.5, 3)))


def test_version(capsys):
    assert main(["version"]) == 0
    assert "version:" in capsys.readouterr().out


def test_faidx_index_idxstats_checkref(sim, capsys):
    assert main(["faidx", sim["fa"]]) == 0
    assert os.path.exists(sim["fa"] + ".fai")
    assert main(["index", sim["bam"]]) == 0
    assert os.path.exists(sim["bam"] + ".bai")
    assert main(["idxstats", sim["bam"]]) == 0
    out = capsys.readouterr().out
    fields = out.splitlines()[0].split("\t")
    assert fields[0] == sim["chrom"]
    assert int(fields[2]) > 0
    assert main(["checkref", sim["fa"], sim["bam"]]) == 0
    assert "OK" in capsys.readouterr().out


def test_call_cli(sim, tmp_path):
    out = str(tmp_path / "cli.vcf")
    rc = main(["call", "-f", sim["fa"], "-o", out, "-B", "-A", sim["bam"]])
    assert rc == 0
    header, vars_ = [], []
    with VcfReader(out) as r:
        header = r.header
        vars_ = list(r)
    assert "##source=" in header
    truth_pos = {t[0] for t in sim["truth"]}
    called_pos = {v.pos for v in vars_}
    # all 50% and 10% SNVs found, no positions outside truth
    assert truth_pos <= called_pos
    assert not (called_pos - truth_pos)
    # refuses overwrite
    assert main(["call", "-f", sim["fa"], "-o", out, "-B", sim["bam"]]) == 1


def test_call_parallel_equals_single(sim, tmp_path):
    out1 = str(tmp_path / "single.vcf")
    out2 = str(tmp_path / "par.vcf")
    assert main(["call", "-f", sim["fa"], "-o", out1, "-B", "-A",
                 sim["bam"]]) == 0
    assert main(["call-parallel", "--pp-threads", "3", "-f", sim["fa"],
                 "-o", out2, "-B", "-A", sim["bam"]]) == 0
    v1 = [v.to_line() for v in VcfReader(out1)]
    v2 = [v.to_line() for v in VcfReader(out2)]
    # parallel == single (cf. ecoli-clone_incl_parallel.sh tolerance of 1)
    assert v1 == v2


def test_filter_cli(sim, tmp_path, capsys):
    raw = str(tmp_path / "raw.vcf")
    main(["call", "-f", sim["fa"], "-o", raw, "-B", "-A",
          "--no-default-filter", "-b", "1", sim["bam"]])
    out = str(tmp_path / "filt.vcf")
    rc = main(["filter", "-i", raw, "-o", out, "-v", "100000"])
    assert rc == 0
    with VcfReader(out) as r:
        header = r.header
        vars_ = list(r)
    assert "min_dp_100000" in header
    assert not vars_  # everything fails min coverage 100000


def test_vcfset_cli(sim, tmp_path, capsys):
    a = str(tmp_path / "a.vcf")
    main(["call", "-f", sim["fa"], "-o", a, "-B", "-A", sim["bam"]])
    # self-complement = empty; self-intersect = all
    rc = main(["vcfset", "-a", "complement", "-1", a, "-2", a,
               "--count-only"])
    assert rc == 0
    assert capsys.readouterr().out.strip() == "0"
    rc = main(["vcfset", "-a", "intersect", "-1", a, "-2", a,
               "--count-only"])
    n = int(capsys.readouterr().out.strip())
    assert n == len(list(VcfReader(a)))


def test_uniq_self_is_empty(sim, tmp_path, capsys):
    """Variants from a BAM tested against the same BAM -> nothing uniq
    (tests/uniq.sh)."""
    a = str(tmp_path / "a.vcf")
    main(["call", "-f", sim["fa"], "-o", a, "-B", "-A", sim["bam"]])
    out = str(tmp_path / "uniq.vcf")
    rc = main(["uniq", "-v", a, "-o", out, "--ref", sim["fa"], sim["bam"]])
    assert rc == 0
    got = list(VcfReader(out))
    assert not got


def test_indelqual_uniform(sim, tmp_path):
    out = str(tmp_path / "iq.bam")
    rc = main(["indelqual", "-u", "20,25", "-o", out, sim["bam"]])
    assert rc == 0
    r = next(iter(BamReader(out)))
    bi = r.get_tag("BI")
    bd = r.get_tag("BD")
    assert bi == chr(20 + 33) * r.l_qseq
    assert bd == chr(25 + 33) * r.l_qseq


def test_indelqual_dindel(sim, tmp_path):
    out = str(tmp_path / "dq.bam")
    rc = main(["indelqual", "--dindel", "-f", sim["fa"], "-o", out,
               sim["bam"]])
    assert rc == 0
    r = next(iter(BamReader(out)))
    bi = r.get_tag("BI")
    assert bi is not None and len(bi) == r.l_qseq
    assert r.get_tag("BD") == bi


def test_alnqual_cli(sim, tmp_path):
    out = str(tmp_path / "aq.bam")
    rc = main(["alnqual", "-f", sim["fa"], "-o", out, sim["bam"]])
    assert rc == 0
    r = next(iter(BamReader(out)))
    lb = r.get_tag("lb")
    assert lb is not None and len(lb) == r.l_qseq


def test_viterbi_cli(sim, tmp_path):
    out = str(tmp_path / "vit.bam")
    rc = main(["viterbi", "-f", sim["fa"], "-o", out, sim["bam"]])
    assert rc == 0
    n_in = sum(1 for _ in BamReader(sim["bam"]))
    n_out = sum(1 for _ in BamReader(out))
    assert n_in == n_out


def test_plpsummary(sim, capsys):
    rc = main(["plpsummary", "-f", sim["fa"], "-B", "-A",
               "-r", f"{sim['chrom']}:1-50", sim["bam"]])
    assert rc == 0
    out = capsys.readouterr().out
    lines = [l for l in out.splitlines() if l.startswith(sim["chrom"])]
    assert lines
    f = lines[0].split("\t")
    assert f[0] == sim["chrom"]
    assert f[2] in "ACGTN"


def test_tools_subcommands(sim, tmp_path, capsys):
    a = str(tmp_path / "t.vcf")
    main(["call", "-f", sim["fa"], "-o", a, "-B", "-A", sim["bam"]])
    # indel-ovlp passthrough (no overlaps in SNV-only output)
    out = str(tmp_path / "ovlp.vcf")
    assert main(["indel-ovlp", a, "-o", out]) == 0
    assert len(list(VcfReader(out))) == len(list(VcfReader(a)))
    # add-fake-gt
    gt = str(tmp_path / "gt.vcf")
    assert main(["add-fake-gt", "-i", a, "-o", gt, "-s", "s1", "s2"]) == 0
    with VcfReader(gt) as r:
        assert "FORMAT\ts1\ts2" in r.header
        v = next(iter(r))
        assert v.format == "GT" and v.samples == ["./.", "./."]
    # cluster + vcfplot summary
    assert main(["cluster", a]) == 0
    assert "cluster1" in capsys.readouterr().out
    assert main(["vcfplot", "-i", a, "-o", str(tmp_path / "p.pdf")]) == 0
    import os as _os

    assert _os.path.exists(str(tmp_path / "p.pdf"))


def test_src_qual_with_ign_vcf(sim, tmp_path):
    """-s with -S ign-vcf: ignored positions raise per-read source quality
    (they no longer count as mismatches)."""
    a = str(tmp_path / "sq1.vcf")
    b = str(tmp_path / "sq2.vcf")
    assert main(["call", "-f", sim["fa"], "-o", a, "-B", "-A", "-s",
                 sim["bam"]]) == 0
    # use the own calls as ign list: known variants shouldn't count
    assert main(["call", "-f", sim["fa"], "-o", b, "-B", "-A", "-s",
                 "-S", a, sim["bam"]]) == 0
    va = {(v.pos, v.alt) for v in VcfReader(a)}
    vb = {(v.pos, v.alt) for v in VcfReader(b)}
    # ign-list can only help recover true variants
    assert va <= vb
    # and it must actually change the output (ignored mismatches raise
    # source quals): quals of shared calls differ or new calls appear
    qa = [(v.pos, v.qual) for v in VcfReader(a)]
    qb = [(v.pos, v.qual) for v in VcfReader(b)]
    assert qa != qb, "ign list had no observable effect"


def test_uniq_det_lim(sim, tmp_path):
    a = str(tmp_path / "dl.vcf")
    main(["call", "-f", sim["fa"], "-o", a, "-B", "-A", sim["bam"]])
    out = str(tmp_path / "dlo.vcf")
    rc = main(["uniq", "-v", a, "-o", out, "--ref", sim["fa"],
               "--use-det-lim", sim["bam"]])
    assert rc == 0
    got = list(VcfReader(out))
    # det-lim mode writes all vars; high-AF variants are flagged UNIQ
    # because they *would have been detectable* (that's the semantics:
    # detectability, not presence — lofreq_uniq.c:321-333)
    assert len(got) == len(list(VcfReader(a)))
    high = [v for v in got
            if float(v.info_value("AF")[1]) >= 0.3]
    assert high and all(v.has_info_key("UNIQ") for v in high)


def _mini_bias_bam(tmp_path):
    """Two SNV sites on a 200bp chrom: pos 50 with alt bases at low BQ
    (biased), pos 150 with alt bases at matching quality (unbiased)."""
    import numpy as np
    from lofreq_tpu.io.bai import build_bai
    from lofreq_tpu.io.bam import BamHeader, BamRead, BamWriter
    from lofreq_tpu.io.fasta import write_fasta

    ref = ("A" * 200).encode()
    header = BamHeader("@HD\tVN:1.6\tSO:coordinate\n", [("bt", 200)])
    reads = []
    rng = np.random.default_rng(5)
    for i in range(60):
        r = BamRead()
        r.qname = f"b{i}"
        r.tid = 0
        r.flag = 0
        r.mapq = 60
        r.pos = 0
        seq = bytearray(b"A" * 200)
        qual = np.full(200, 37, np.uint8)
        is_alt1 = i < 15          # biased site: alt reads get low BQ
        if is_alt1:
            seq[50] = ord("C")
            qual[50] = 8 + int(rng.integers(0, 4))
        is_alt2 = i % 3 == 0      # unbiased site: same qual as ref
        if is_alt2:
            seq[150] = ord("G")
        r.seq = bytes(seq)
        r.qual = qual
        r.set_cigar_string("200M")
        reads.append(r)
    bam = str(tmp_path / "bias.bam")
    with BamWriter(bam, header) as w:
        for r in reads:
            w.write(r)
    build_bai(bam)
    fa = str(tmp_path / "bias.fa")
    write_fasta(fa, {"bt": ref.decode()})
    vcf = str(tmp_path / "bias_in.vcf")
    from lofreq_tpu.io.vcf import new_header
    with open(vcf, "w") as fh:
        fh.write(new_header())
        fh.write("bt\t51\t.\tA\tC\t100\tPASS\tDP=60;AF=0.25\n")
        fh.write("bt\t151\t.\tA\tG\t100\tPASS\tDP=60;AF=0.33\n")
    return bam, vcf


def test_bias_cli(tmp_path, capsys):
    bam, vcf = _mini_bias_bam(tmp_path)
    out = str(tmp_path / "bias_out.vcf")
    rc = main(["bias", "-b", bam, "-i", vcf, "-o", out,
                   "--bq-filter", "3"])
    assert rc == 0
    from lofreq_tpu.io.vcf import read_vcf
    _, vs = read_vcf(out)
    assert len(vs) == 2
    biased, unbiased = vs
    bb1 = int(biased.info_value("BB")[1])
    bb2 = int(unbiased.info_value("BB")[1])
    # low-BQ alt site shows strong base-quality bias; clean site doesn't
    assert bb1 > 30
    assert bb2 == 0
    assert not biased.passes()      # fdr<0.001 FILTER applied
    assert unbiased.passes()
    # CB combines MB (no mapping bias -> 0) and BB
    assert int(biased.info_value("CB")[1]) > 0


def test_af_constructed_exact(tmp_path):
    """af_tests.sh analog (reference tests/af_tests.sh:25-51): constructed
    BAMs with known allele fractions must produce exact AF= INFO values
    (deletion AF=0.5, SNV AF=1.0; insertion AF=0.5, SNV AF=0.25)."""
    import numpy as np
    from lofreq_tpu.io.bai import build_bai
    from lofreq_tpu.io.bam import BamHeader, BamRead, BamWriter
    from lofreq_tpu.io.fasta import write_fasta

    ref = ("ACGT" * 25)
    fa = str(tmp_path / "af.fa")
    write_fasta(fa, {"af1": ref})
    header = BamHeader("@HD\tVN:1.6\tSO:coordinate\n", [("af1", 100)])

    def mk(i, cigar, seq):
        r = BamRead()
        r.qname = f"af{i}"
        r.tid = 0
        r.flag = 0
        r.mapq = 60
        r.pos = 0
        r.seq = seq
        r.qual = np.full(len(seq), 40, np.uint8)
        r.set_cigar_string(cigar)
        return r

    # --- deletion BAM: 20/40 reads delete CG after base 1; all carry T at
    # ref pos 8 (A) -> SNV AF=1.0
    bam1 = str(tmp_path / "dels.bam")
    with BamWriter(bam1, header) as w:
        for i in range(40):
            if i % 2 == 0:
                seq = bytearray((ref[0] + ref[3:50]).encode())
                seq[8 - 2] = ord("T")  # ref pos 8 is at read offset 6
                w.write(mk(i, "1M2D47M", bytes(seq)))
            else:
                seq = bytearray(ref[:48].encode())
                seq[8] = ord("T")
                w.write(mk(i, "48M", bytes(seq)))
    build_bai(bam1)
    qbam1 = str(tmp_path / "dels_iq.bam")
    assert main(["indelqual", "--uniform", "45,45", "-o", qbam1, bam1]) == 0
    build_bai(qbam1)
    out1 = str(tmp_path / "dels.vcf")
    assert main(["call", "-f", fa, "-o", out1, "--call-indels", "-B", "-A",
                 "--no-default-filter", qbam1]) == 0
    recs = [l.split("\t") for l in open(out1) if not l.startswith("#")]
    dels = [r for r in recs if r[1] == "1" and r[3] == "ACG" and r[4] == "A"]
    assert dels and "AF=0.5" in dels[0][7], recs
    snv1 = [r for r in recs if r[3] == "A" and r[4] == "T"]
    assert snv1 and "AF=1.0" in snv1[0][7], recs

    # --- insertion BAM: 20/40 reads insert AA after base 2 (C) -> C->CAA
    # AF=0.5; 10/40 carry G at ref pos 12 (A? pos 12 = A) -> use pos 13=C->G
    bam2 = str(tmp_path / "ins.bam")
    with BamWriter(bam2, header) as w:
        for i in range(40):
            if i % 2 == 0:
                seq = bytearray((ref[:2] + "AA" + ref[2:48]).encode())
                if i % 4 == 0:  # 10 of 40 reads -> SNV AF=0.25
                    seq[4 + 11] = ord("G")  # ref pos 13 (C) at offset 15
                w.write(mk(i, "2M2I46M", bytes(seq)))
            else:
                w.write(mk(i, "48M", ref[:48].encode()))
    build_bai(bam2)
    qbam2 = str(tmp_path / "ins_iq.bam")
    assert main(["indelqual", "--uniform", "45,45", "-o", qbam2, bam2]) == 0
    build_bai(qbam2)
    out2 = str(tmp_path / "ins.vcf")
    assert main(["call", "-f", fa, "-o", out2, "--call-indels", "-B", "-A",
                 "-a", "0.5", "--no-default-filter", qbam2]) == 0
    recs = [l.split("\t") for l in open(out2) if not l.startswith("#")]
    ins = [r for r in recs if r[1] == "2" and r[3] == "C" and r[4] == "CAA"]
    assert ins and "AF=0.5" in ins[0][7], recs
    snv2 = [r for r in recs if r[3] == "C" and r[4] == "G"]
    assert snv2 and "AF=0.25" in snv2[0][7], recs


def test_consvar_not_qual_filtered(tmp_path, capsys):
    """consvar_noqual_filter.sh analog: CONSVAR records carry QUAL=. and
    must pass through --snvqual-thresh untouched (lofreq_filter.c:319
    requires qual>-1; the MTC path maps missing qual to INT_MAX)."""
    from lofreq_tpu.io.vcf import new_header

    vcf = str(tmp_path / "cv.vcf")
    with open(vcf, "w") as fh:
        fh.write(new_header())
        fh.write("c1\t10\t.\tA\tT\t.\t.\tDP=50;AF=0.99;SB=0;"
                 "DP4=0,0,25,25;CONSVAR\n")
        fh.write("c1\t20\t.\tG\tC\t.\t.\tDP=60;AF=1.0;SB=0;"
                 "DP4=0,0,30,30;CONSVAR\n")
        fh.write("c1\t30\t.\tT\tA\t5\tPASS\tDP=50;AF=0.02;SB=0;"
                 "DP4=24,24,1,1\n")
    out = str(tmp_path / "cv_out.vcf")
    rc = main(["filter", "-i", vcf, "-o", out, "--snvqual-thresh", "100",
               "--no-defaults", "--print-all"])
    assert rc == 0
    recs = [l.split("\t") for l in open(out) if not l.startswith("#")]
    assert len(recs) == 3
    # CONSVARs untouched; the qual-5 record fails the phred-100 threshold
    assert recs[0][6] in (".", "PASS")
    assert recs[1][6] in (".", "PASS")
    assert "min_snvqual" in recs[2][6]


def test_call_with_bed_regions(sim, tmp_path):
    """bed.sh analog: `call -l regions.bed` restricts calls to BED
    intervals; all variants outside vanish, those inside are unchanged."""
    full = str(tmp_path / "full.vcf")
    assert main(["call", "-f", sim["fa"], "-o", full, "--no-default-filter",
                 sim["bam"]]) == 0
    recs = [l.split("\t") for l in open(full) if not l.startswith("#")]
    assert len(recs) >= 2, "need >=2 variants to split by BED"
    # restrict to a window around the first variant only
    pos0 = int(recs[0][1]) - 1
    bed = str(tmp_path / "r.bed")
    with open(bed, "w") as fh:
        fh.write(f"{sim['chrom']}\t{max(0, pos0 - 50)}\t{pos0 + 50}\n")
    sel = str(tmp_path / "sel.vcf")
    assert main(["call", "-f", sim["fa"], "-o", sel, "--no-default-filter",
                 "-l", bed, sim["bam"]]) == 0
    srecs = [l.split("\t") for l in open(sel) if not l.startswith("#")]
    in_window = [r for r in recs
                 if max(0, pos0 - 50) <= int(r[1]) - 1 < pos0 + 50]
    assert [r[1] for r in srecs] == [r[1] for r in in_window]
    assert srecs[0][1] == recs[0][1]


def test_vcfplot_full_pages(sim, tmp_path):
    """Expanded vcfplot: multi-page PDF with boxplot/hist/scatter per
    prop, subst types + Ts/Tv, pairwise heatmaps; summary tables."""
    from lofreq_tpu.cli import main

    out = str(tmp_path / "calls.vcf")
    assert main(["call", "-f", sim["fa"], "-o", out, sim["bam"],
                 "--no-device-screen", "--no-device-baq"]) == 0
    pdf = str(tmp_path / "full.pdf")
    assert main(["vcfplot", "-i", out, "-o", pdf]) == 0
    data = open(pdf, "rb").read()
    assert data[:5] == b"%PDF-"
    assert data.count(b"/Type /Page ") + data.count(b"/Type/Page") >= 5
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        assert main(["vcfplot", "-i", out, "-o", pdf,
                     "--summary-only"]) == 0
    txt = buf.getvalue()
    assert "AF\tmedian\t" in txt
    assert "Distance (log10)\trange-min\trange-max\tcount" in txt
