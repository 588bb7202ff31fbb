"""Somatic pipeline end-to-end test: tumor/normal pair with planted
germline + somatic SNVs (mirrors somatic_CHH966_chr22.sh's oracle: true
somatic variants recovered, germline excluded)."""

import os

import numpy as np
import pytest

from lofreq_tpu.cli import main
from lofreq_tpu.io.bai import build_bai
from lofreq_tpu.io.bam import BamHeader, BamRead, BamWriter, FREVERSE
from lofreq_tpu.io.fasta import write_fasta
from lofreq_tpu.io.vcf import VcfReader

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def make_pair(tmpdir, genome_len=3000, depth=400, read_len=100, seed=5):
    rng = np.random.default_rng(seed)
    genome = BASES[rng.integers(0, 4, genome_len)]
    margin = read_len + 10
    positions = rng.choice(
        np.arange(margin, genome_len - margin), 8, replace=False)
    positions.sort()
    germline = []  # present in both at ~50%
    somatic = []  # tumor only at 20%
    for i, pos in enumerate(positions):
        ref_b = genome[pos]
        alt_b = ref_b
        while alt_b == ref_b:
            alt_b = BASES[rng.integers(0, 4)]
        if i % 2 == 0:
            germline.append((int(pos), chr(ref_b), chr(alt_b)))
        else:
            somatic.append((int(pos), chr(ref_b), chr(alt_b)))

    def write_bam(path, variants_af):
        header = BamHeader("@HD\tVN:1.6\tSO:coordinate\n",
                           [("chrS", genome_len)])
        n_reads = genome_len * depth // read_len
        starts = np.sort(rng.integers(0, genome_len - read_len, n_reads))
        with BamWriter(path, header) as w:
            for i, start in enumerate(starts):
                r = BamRead()
                r.qname = f"p{i}"
                r.tid = 0
                r.pos = int(start)
                r.flag = FREVERSE if rng.random() < 0.5 else 0
                r.mapq = 60
                base = genome[start : start + read_len].copy()
                for pos, _rb, ab, af in variants_af:
                    if start <= pos < start + read_len and rng.random() < af:
                        base[pos - start] = ord(ab)
                qual = rng.integers(30, 39, read_len).astype(np.uint8)
                errp = 10.0 ** (-qual.astype(np.float64) / 10.0)
                for j in np.nonzero(rng.random(read_len) < errp)[0]:
                    b = base[j]
                    while b == base[j]:
                        b = BASES[rng.integers(0, 4)]
                    base[j] = b
                r.seq = base.tobytes()
                r.qual = qual
                r.set_cigar_string(f"{read_len}M")
                w.write(r)
        build_bai(path)

    n_vars = [(p, rb, ab, 0.5) for p, rb, ab in germline]
    t_vars = n_vars + [(p, rb, ab, 0.2) for p, rb, ab in somatic]
    fa = f"{tmpdir}/ref.fa"
    write_fasta(fa, {"chrS": genome.tobytes().decode()})
    nb = f"{tmpdir}/normal.bam"
    tb = f"{tmpdir}/tumor.bam"
    write_bam(nb, n_vars)
    write_bam(tb, t_vars)
    return dict(fa=fa, normal=nb, tumor=tb, germline=germline,
                somatic=somatic)


@pytest.fixture(scope="module")
def pair(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("som")
    return make_pair(str(tmp))


def test_somatic_pipeline(pair, tmp_path):
    prefix = str(tmp_path / "out_")
    rc = main(["somatic", "-t", pair["tumor"], "-n", pair["normal"],
               "-f", pair["fa"], "-o", prefix, "--baq-off"])
    assert rc == 0
    fin = prefix + "somatic_final.snvs.vcf.gz"
    assert os.path.exists(fin)
    got = {(v.pos, v.ref, v.alt) for v in VcfReader(fin)}
    som = set(pair["somatic"])
    germ = set(pair["germline"])
    # all somatic variants recovered (>=2 would match the reference test;
    # we demand all since the simulation is clean)
    missed = som - got
    assert not missed, f"missed somatic: {missed}"
    # no germline leaked through
    leaked = got & germ
    assert not leaked, f"germline leaked: {leaked}"
    # SOMATIC tag present
    v = next(iter(VcfReader(fin)))
    assert v.has_info_key("SOMATIC")
    assert v.has_info_key("UQ")


def test_somatic_continue(pair, tmp_path):
    prefix = str(tmp_path / "c_")
    assert main(["somatic", "-t", pair["tumor"], "-n", pair["normal"],
                 "-f", pair["fa"], "-o", prefix, "--baq-off"]) == 0
    fin = prefix + "somatic_final.snvs.vcf.gz"
    before = open(fin, "rb").read()
    # rerun without --continue refuses (clean FATAL, nonzero exit)
    assert main(["somatic", "-t", pair["tumor"], "-n", pair["normal"],
                 "-f", pair["fa"], "-o", prefix, "--baq-off"]) == 1
    # rerun with --continue reuses everything and leaves outputs unchanged
    assert main(["somatic", "-t", pair["tumor"], "-n", pair["normal"],
                 "-f", pair["fa"], "-o", prefix, "--baq-off",
                 "--continue"]) == 0
    assert open(fin, "rb").read() == before


def test_somatic_parallel_matches_single(pair, tmp_path):
    p1 = str(tmp_path / "s1_")
    p2 = str(tmp_path / "s2_")
    assert main(["somatic", "-t", pair["tumor"], "-n", pair["normal"],
                 "-f", pair["fa"], "-o", p1, "--baq-off"]) == 0
    assert main(["somatic", "-t", pair["tumor"], "-n", pair["normal"],
                 "-f", pair["fa"], "-o", p2, "--baq-off",
                 "--threads", "3"]) == 0
    a = [v.to_line() for v in
         VcfReader(p1 + "somatic_final.snvs.vcf.gz")]
    b = [v.to_line() for v in
         VcfReader(p2 + "somatic_final.snvs.vcf.gz")]
    assert a == b and a


def test_alt_allele_in_normal_and_fn_analysis(pair, tmp_path, capsys):
    # call tumor alone: somatic + germline all present
    t_calls = str(tmp_path / "t.vcf")
    main(["call", "-f", pair["fa"], "-o", t_calls, "-B", "-A",
          pair["tumor"]])
    out = str(tmp_path / "aan.vcf")
    rc = main(["alt-allele-in-normal", "-i", t_calls, "-o", out,
               "-b", pair["normal"]])
    assert rc == 0
    kept = {(v.pos, v.alt) for v in VcfReader(out)}
    germ = {(p, a) for p, r, a in pair["germline"]}
    som = {(p, a) for p, r, a in pair["somatic"]}
    assert not (kept & germ), "germline survived observed-in-control filter"
    assert som <= kept

    # FN analysis: truth = tumor calls, calls = aan-filtered output
    rc = main(["analyze-somatic-fn", "--truth", t_calls, "--calls", out,
               "-t", pair["tumor"], "-n", pair["normal"]])
    assert rc == 0
    outp = capsys.readouterr().out
    assert "present-in-normal" in outp


def test_somatic_indels(tmp_path):
    """Somatic indel calling: a tumor-only insertion is recovered, a
    germline deletion (in both samples) is excluded."""
    rng = np.random.default_rng(9)
    genome = BASES[rng.integers(0, 4, 2000)]
    fa = str(tmp_path / "si.fa")
    write_fasta(fa, {"chrI": genome.tobytes().decode()})
    som_pos, germ_pos = 600, 1400   # somatic ins after 600; germline del

    def write_bam(path, with_som):
        header = BamHeader("@HD\tVN:1.6\tSO:coordinate\n", [("chrI", 2000)])
        n_reads = 2000 * 300 // 100
        starts = np.sort(rng.integers(0, 1900, n_reads))
        with BamWriter(path, header) as w:
            for i, start in enumerate(starts):
                r = BamRead()
                r.qname = f"s{i}"
                r.tid = 0
                r.pos = int(start)
                r.flag = FREVERSE if rng.random() < 0.5 else 0
                r.mapq = 60
                base = genome[start:start + 100].copy()
                cigar = "100M"
                at = som_pos - start
                gat = germ_pos - start
                if with_som and 5 <= at < 90 and rng.random() < 0.3:
                    base = np.concatenate([
                        base[:at + 1],
                        np.frombuffer(b"AG", np.uint8), base[at + 1:98]])
                    cigar = f"{at+1}M2I{97-at}M"
                elif 5 <= gat < 90 and rng.random() < 0.5:
                    ext = genome[start + 100:start + 103]
                    base = np.concatenate(
                        [base[:gat + 1], base[gat + 4:], ext])[:100]
                    cigar = f"{gat+1}M3D{len(base)-gat-1}M"
                r.seq = base.tobytes()
                r.qual = np.full(len(base), 37, np.uint8)
                r.set_cigar_string(cigar)
                w.write(r)
        build_bai(path)

    tb_raw = str(tmp_path / "t.bam")
    nb_raw = str(tmp_path / "n.bam")
    write_bam(tb_raw, True)
    write_bam(nb_raw, False)
    tb, nb = str(tmp_path / "tq.bam"), str(tmp_path / "nq.bam")
    assert main(["indelqual", "--uniform", "45,45", "-o", tb, tb_raw]) == 0
    assert main(["indelqual", "--uniform", "45,45", "-o", nb, nb_raw]) == 0
    build_bai(tb)
    build_bai(nb)

    out = str(tmp_path / "si_")
    assert main(["somatic", "-t", tb, "-n", nb, "-f", fa, "-o", out,
                 "--call-indels"]) == 0
    import glob
    finals = glob.glob(out + "somatic_final*.vcf.gz")
    assert finals
    calls = set()
    for f in finals:
        with VcfReader(f) as rdr:
            for v in rdr:
                if v.is_indel():
                    calls.add(v.pos)
    assert som_pos in calls, (calls, finals)
    assert germ_pos not in calls, calls
