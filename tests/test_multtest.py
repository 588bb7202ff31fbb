"""Multiple-testing module vs the R reference results embedded in the
reference's multtest.c:219-241, plus the fdr.sh capped-input scenario
through the filter CLI."""

import numpy as np

from lofreq_tpu.cli import main
from lofreq_tpu.core.multtest import bonf_corr, fdr, holm_bonf_corr
from lofreq_tpu.core.phred import prob_to_phred
from lofreq_tpu.io.vcf import new_header

PS = np.array([
    2.354054e-07, 2.101590e-05, 2.576842e-05, 9.814783e-05, 1.052610e-04,
    1.241481e-04, 1.325988e-04, 1.568503e-04, 2.254557e-04, 3.795380e-04,
    6.114943e-04, 1.613954e-03, 3.302430e-03, 3.538342e-03, 5.236997e-03,
    6.831909e-03, 7.059226e-03, 8.805129e-03, 9.401040e-03, 1.129798e-02,
    2.115017e-02, 4.922736e-02, 6.053298e-02, 6.262239e-02, 7.395153e-02,
    8.281103e-02, 8.633331e-02, 1.190654e-01, 1.890796e-01, 2.058494e-01,
    2.209214e-01, 2.856000e-01, 3.048895e-01, 4.660682e-01, 4.830809e-01,
    4.921755e-01, 5.319453e-01, 5.751550e-01, 5.783195e-01, 6.185894e-01,
    6.363620e-01, 6.448587e-01, 6.558414e-01, 6.885884e-01, 7.189864e-01,
    8.179539e-01, 8.274487e-01, 8.971300e-01, 9.118680e-01, 9.437890e-01,
])


def test_fdr_matches_embedded_r_results():
    """multtest.c:224-244 — R p.adjust(p, "BH") counts and the standalone
    binary's reported rejections."""
    assert len(fdr(PS, 0.05, -1)) == 20          # BH, n = len(p)
    assert len(fdr(PS, 0.05, 1000)) == 10        # BH with n=1000
    assert len(fdr(PS, 0.001, 100)) == 3
    assert len(fdr(PS, 1.0, 10000)) == 11


def test_bonf_and_holm_sanity():
    corr = bonf_corr(PS, 50)
    assert int((corr < 0.05).sum()) == 11        # R: sum(p*50 < .05)
    h = holm_bonf_corr(PS, 0.05, -1)
    # Holm rejects at least as many as plain Bonferroni
    assert int((h < 0.05).sum()) >= 11


def _phred(p):
    return prob_to_phred(np.float64(p))


def test_filter_fdr_textbook(tmp_path):
    """fdr.sh shape: BH filtering through the CLI matches the core fdr()
    on the same phred-quantized p-values, including the capped-input +
    --snvqual-ntests 25 re-run (the reference's exact expected count of 5
    depends on its external data file; here we assert CLI == core)."""
    # BH1995 example p-values + filler (fdr.py doctest / multtest.c)
    ps = [0.0001, 0.0004, 0.0019, 0.0095, 0.0201, 0.0278, 0.0298, 0.0344,
          0.0459, 0.3240, 0.4262, 0.5719, 0.6528, 0.7590, 1.0]
    ps = ps + [1.0] * 10
    vcf = str(tmp_path / "fdr_in.vcf")
    with open(vcf, "w") as fh:
        fh.write(new_header())
        for i, p in enumerate(ps):
            q = _phred(p) if p < 1.0 else 0
            fh.write(f"t\t{i*10+1}\t.\tA\tC\t{q}\tPASS\t"
                     f"DP=100;AF=0.1;SB=0;DP4=45,45,5,5\n")
    out = str(tmp_path / "fdr_out.vcf")
    assert main(["filter", "-i", vcf, "-o", out, "--no-defaults",
                 "-q", "fdr", "-r", "0.25"]) == 0
    n = sum(1 for l in open(out) if not l.startswith("#"))
    # expected: BH on the phred-quantized probabilities
    import numpy as _np
    pq = _np.array([10.0 ** (-(_phred(p) if p < 1.0 else 0) / 10.0)
                    for p in ps])
    n_exp = len(fdr(pq, 0.25, -1))
    assert n == n_exp, (n, n_exp)
    # capped input: first 11 records with --snvqual-ntests 25
    vcf2 = str(tmp_path / "fdr_in2.vcf")
    lines = [l for l in open(vcf)]
    hdr = [l for l in lines if l.startswith("#")]
    recs = [l for l in lines if not l.startswith("#")][:11]
    with open(vcf2, "w") as fh:
        fh.writelines(hdr + recs)
    out2 = str(tmp_path / "fdr_out2.vcf")
    assert main(["filter", "-i", vcf2, "-o", out2, "--no-defaults",
                 "-q", "fdr", "-r", "0.25", "-s", "25"]) == 0
    n2 = sum(1 for l in open(out2) if not l.startswith("#"))
    # all rejections lie in the first 11 records, so capping the input
    # while fixing ntests=25 must reproduce the same rejected set
    assert n2 == n_exp, (n2, n_exp)
