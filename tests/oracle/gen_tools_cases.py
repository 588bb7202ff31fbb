#!/usr/bin/env python3
"""Golden generator for the pure-python reference tools.

Runs the reference's OWN scripts/modules (unmodified, from the
read-only checkout) over fuzzed inputs and packs inputs + outputs into
tests/golden/tools.json:

  - lofreq2_indel_ovlp.py: fuzzed VCFs with overlapping indel clusters
    (qual ties broken by AF, '.' quals = MAX_INT, multi-chrom stacks)
  - lofreq2_add_fake_gt.py: fuzzed VCFs x sample lists
  - lofreq_star.multiple_testing / fdr: fuzzed p-value arrays
"""

import json
import random
import subprocess
import sys

REF_SCRIPTS = "/root/reference/src/tools/scripts"
REF_PKG = "/root/reference/src/tools"

HEADER = """##fileformat=VCFv4.0
##source=tools-differential
##INFO=<ID=DP,Number=1,Type=Integer,Description="Raw Depth">
##INFO=<ID=AF,Number=1,Type=Float,Description="Allele Frequency">
##INFO=<ID=INDEL,Number=0,Type=Flag,Description="Indicates that the variant is an INDEL.">
#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO
"""

BASES = "ACGT"


def make_indel_vcf(rng, n=50):
    """Position-sorted VCF with deliberate overlap clusters."""
    rows = []
    pos = 10
    chrom = "c1"
    for i in range(n):
        if rng.random() < 0.1:
            chrom = rng.choice(["c1", "c2"])
            pos = 10
        # cluster: several indels within a few bases
        cluster = rng.randrange(1, 4)
        for _ in range(cluster):
            ref = rng.choice(BASES)
            seq = "".join(rng.choice(BASES)
                          for _ in range(rng.randrange(1, 5)))
            if rng.random() < 0.5:
                refs, alts = ref, ref + seq
            else:
                refs, alts = ref + seq, ref
            qual = rng.choice([".", str(rng.randrange(0, 500)),
                               str(rng.randrange(0, 500))])
            af = rng.random()
            rows.append((chrom, pos,
                         f"{chrom}\t{pos}\t.\t{refs}\t{alts}\t{qual}\t"
                         f"PASS\tDP={rng.randrange(10, 200)};"
                         f"AF={af:.6f};INDEL"))
            pos += rng.randrange(0, 3)  # overlap likely
        pos += rng.randrange(6, 60)
    rows.sort(key=lambda r: (r[0], r[1]))
    return HEADER + "\n".join(r[2] for r in rows) + "\n"


def main():
    out_json = sys.argv[1]
    rng = random.Random(99)
    golden = dict(indel_ovlp=[], multtest=[])

    import os
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        for i in range(8):
            vcf = make_indel_vcf(rng, n=30 + 10 * i)
            vin = os.path.join(td, f"io{i}.vcf")
            open(vin, "w").write(vcf)
            proc = subprocess.run(
                [sys.executable,
                 os.path.join(REF_SCRIPTS, "lofreq2_indel_ovlp.py"), vin],
                capture_output=True, text=True, timeout=60, check=True)
            golden["indel_ovlp"].append(dict(vcf=vcf,
                                             output=proc.stdout))
        # NB lofreq2_add_fake_gt.py is python-2-only at runtime
        # (csv.writer(quotechar='') + binary-mode writer raise under
        # py3), so it cannot be executed as an oracle here; its
        # behavior is covered by the repo's own tests instead.

    # load the modules directly (the package __init__ asserts py2.7;
    # the modules themselves are version-clean)
    import importlib.util

    def _load(name, path):
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod

    ref_mt = _load("ref_mt",
                   REF_PKG + "/lofreq_star/multiple_testing.py")
    ref_fdr = _load("ref_fdr", REF_PKG + "/lofreq_star/fdr.py")

    for i in range(30):
        n = rng.randrange(1, 40)
        pvals = [round(rng.random() ** rng.choice([1, 2, 6]), 10)
                 for _ in range(n)]
        # include exact ties and 0/1 walls
        if n > 3:
            pvals[1] = pvals[0]
            if rng.random() < 0.3:
                pvals[2] = 0.0
            if rng.random() < 0.3:
                pvals[3] = 1.0
        a = rng.choice([0.05, 0.01, 0.25])
        ntests = rng.choice([None, n * 7 + 3])  # reference asserts n > len(pvals)
        # NB the python HolmBonferroni is not recorded: no shipped
        # reference path invokes it (lofreq2_bias.py's 'holmbonf'
        # branch applies plain Bonferroni, lofreq2_bias.py:318-321)
        bonf = list(ref_mt.Bonferroni(pvals, a=a,
                                      n=ntests).corrected_pvals)
        fdr_idx = ref_fdr.fdr(pvals, a=a, n=ntests)
        golden["multtest"].append(dict(
            pvals=pvals, a=a, n=ntests, bonf=bonf, fdr=fdr_idx))

    with open(out_json, "w") as fh:
        json.dump(golden, fh)
    print(f"wrote {out_json}: {len(golden['indel_ovlp'])} indel_ovlp, "
          f"{len(golden['multtest'])} multtest")


if __name__ == "__main__":
    main()
