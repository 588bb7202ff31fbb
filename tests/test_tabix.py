"""Tabix (.tbi) build/load/query (io/tabix.py) — the reference's random
access pattern for vcfset (lofreq_vcfset.c:427-433) and the call-parallel
index step (lofreq2_call_pparallel.py:164-185)."""

import numpy as np
import pytest

from lofreq_tpu.io.bgzf import BgzfWriter
from lofreq_tpu.io.tabix import TabixVcf, TbiIndex, build_tbi
from lofreq_tpu.io.vcf import new_header


def _write_vcf_gz(path, records):
    w = BgzfWriter(path)
    w.write(new_header("test").encode())
    for chrom, pos1, ref, alt in records:
        w.write(f"{chrom}\t{pos1}\t.\t{ref}\t{alt}\t50\tPASS\t"
                f"DP=10;AF=0.5;SB=0;DP4=1,2,3,4\n".encode())
    w.close()


def _mk_records(rng, chroms, n_per):
    recs = []
    for chrom in chroms:
        # spread positions far apart so multiple bins/linear windows exist
        pos = np.sort(rng.choice(np.arange(1, 3_000_000), n_per,
                                 replace=False))
        for p in pos:
            recs.append((chrom, int(p), "ACGT"[int(p) % 4], "T"))
    return recs


def test_tbi_roundtrip_and_query(tmp_path):
    rng = np.random.default_rng(7)
    recs = _mk_records(rng, ["chr1", "chr2"], 400)
    path = str(tmp_path / "x.vcf.gz")
    _write_vcf_gz(path, recs)
    idx = build_tbi(path)
    assert idx.names == ["chr1", "chr2"]

    # load back from disk and query against a brute-force scan
    idx2 = TbiIndex.load(path + ".tbi")
    assert idx2.names == idx.names
    assert idx2.conf["format"] == 2 and idx2.conf["col_beg"] == 2

    tv = TabixVcf(path)
    for _ in range(50):
        chrom = ["chr1", "chr2"][int(rng.integers(2))]
        beg = int(rng.integers(0, 3_000_000))
        end = beg + int(rng.integers(1, 200_000))
        got = sorted(int(l.split(b"\t")[1]) for l in
                     tv.fetch_lines(chrom, beg, end))
        want = sorted(p for c, p, _r, _a in recs
                      if c == chrom and beg < p <= end)
        assert got == want, (chrom, beg, end)
    tv.close()


def test_tbi_rejects_unsorted(tmp_path):
    path = str(tmp_path / "bad.vcf.gz")
    _write_vcf_gz(path, [("c1", 100, "A", "T"), ("c1", 50, "A", "T")])
    with pytest.raises(IOError):
        build_tbi(path)


def test_vcfset_uses_tabix_and_matches_memory(tmp_path):
    """complement/intersect results must be identical whether vcf2 goes
    through the tabix index or the in-memory fallback."""
    from lofreq_tpu.pipelines.vcfset import run_vcfset

    rng = np.random.default_rng(13)
    r1 = _mk_records(rng, ["chr1"], 300)
    r2 = r1[::3] + _mk_records(rng, ["chr1"], 50)
    v1 = str(tmp_path / "a.vcf.gz")
    v2 = str(tmp_path / "b.vcf.gz")
    _write_vcf_gz(v1, r1)
    _write_vcf_gz(v2, sorted(set(r2), key=lambda r: r[1]))

    mem_c = run_vcfset("complement", v1, v2, count_only=True)
    mem_i = run_vcfset("intersect", v1, v2, count_only=True)
    build_tbi(v2)
    tbx_c = run_vcfset("complement", v1, v2, count_only=True)
    tbx_i = run_vcfset("intersect", v1, v2, count_only=True)
    assert (mem_c, mem_i) == (tbx_c, tbx_i)
    assert mem_c + mem_i == 300


def test_call_parallel_emits_tbi(tmp_path):
    from simulate import simulate

    from lofreq_tpu.cli import main

    art = simulate(str(tmp_path), genome_len=12000, depth=50, seed=2)
    out = str(tmp_path / "out.vcf.gz")
    rc = main(["call-parallel", "--pp-threads", "2", "-f", art["fa"],
               "-o", out, art["bam"]])
    assert rc == 0
    idx = TbiIndex.load(out + ".tbi")
    tv = TabixVcf(out)
    n = sum(1 for _ in tv.fetch_lines(idx.names[0], 0, 12000))
    assert n > 0
    tv.close()
