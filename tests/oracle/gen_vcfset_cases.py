#!/usr/bin/env python3
"""Fuzzed VCF pairs x argument sets for the vcfset differential.

--run <oracle_binary> <out.json>: generates vcf1/vcf2 pairs with
controlled overlap (same pos+allele, same pos different allele,
disjoint; SNVs, indels, multi-char alleles, non-PASS rows), drives the
reference's main_vcfset per argument set and packs (inputs, args,
output VCF text, stdout, rc) into the golden JSON.
"""

import json
import os
import random
import subprocess
import sys
import tempfile

HEADER = """##fileformat=VCFv4.0
##source=lofreq_tpu-vcfset-differential
##INFO=<ID=DP,Number=1,Type=Integer,Description="Raw Depth">
##INFO=<ID=AF,Number=1,Type=Float,Description="Allele Frequency">
##INFO=<ID=SB,Number=1,Type=Integer,Description="Phred-scaled strand bias at this position">
##INFO=<ID=INDEL,Number=0,Type=Flag,Description="Indicates that the variant is an INDEL.">
#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO
"""

BASES = "ACGT"


def _var(rng, chrom, pos, indel=None):
    ref = rng.choice(BASES)
    if indel is None:
        indel = rng.random() < 0.3
    if indel:
        seq = "".join(rng.choice(BASES)
                      for _ in range(rng.randrange(1, 3)))
        if rng.random() < 0.5:
            refs, alts = ref, ref + seq
        else:
            refs, alts = ref + seq, ref
        info = f"DP={rng.randrange(10, 300)};AF={rng.random():.6f};INDEL"
    else:
        refs = ref
        alts = rng.choice([b for b in BASES if b != ref])
        info = f"DP={rng.randrange(10, 300)};AF={rng.random():.6f}"
    filt = rng.choice([".", ".", "PASS", "min_af_0.05"])
    return (chrom, pos, refs, alts,
            f"{chrom}\t{pos}\t.\t{refs}\t{alts}\t"
            f"{rng.randrange(0, 2000)}\t{filt}\t{info}")


def make_pair(rng, n=40):
    v1, v2 = [], []
    pos = 0
    for _ in range(n):
        pos += rng.randrange(2, 300)
        kind = rng.random()
        chrom = rng.choice(["c1", "c2"])
        a = _var(rng, chrom, pos)
        if kind < 0.35:            # identical in both
            v1.append(a[4])
            v2.append(a[4])
        elif kind < 0.55:          # same pos, different allele
            v1.append(a[4])
            b = _var(rng, chrom, pos)
            while b[2] == a[2] and b[3] == a[3]:
                b = _var(rng, chrom, pos)
            v2.append(b[4])
        elif kind < 0.8:           # vcf1 only
            v1.append(a[4])
        else:                      # vcf2 only
            v2.append(a[4])
    return (HEADER + "\n".join(v1) + "\n",
            HEADER + "\n".join(v2) + "\n")


ARG_SETS = [
    ["-a", "intersect"],
    ["-a", "intersect", "--only-pos"],
    ["-a", "intersect", "--only-passed"],
    ["-a", "intersect", "--only-snvs"],
    ["-a", "intersect", "--only-indels"],
    ["-a", "intersect", "-I", "SOMATIC"],
    ["-a", "intersect", "--count-only"],
    ["-a", "complement"],
    ["-a", "complement", "--only-pos"],
    ["-a", "complement", "--only-passed"],
    ["-a", "complement", "--only-snvs"],
    ["-a", "complement", "--only-indels"],
    ["-a", "complement", "--count-only"],
]


def main():
    assert sys.argv[1] == "--run"
    oracle, out_json = sys.argv[2], sys.argv[3]
    rng = random.Random(4242)
    pairs = [make_pair(rng), make_pair(rng, 15), make_pair(rng, 80)]
    cases = []
    with tempfile.TemporaryDirectory() as td:
        for pi, (vcf1, vcf2) in enumerate(pairs):
            p1 = os.path.join(td, f"a{pi}.vcf")
            p2 = os.path.join(td, f"b{pi}.vcf")
            open(p1, "w").write(vcf1)
            open(p2, "w").write(vcf2)
            for ai, args in enumerate(ARG_SETS):
                vout = os.path.join(td, f"o{pi}_{ai}.vcf")
                proc = subprocess.run(
                    [oracle, "-1", p1, "-2", p2, "-o", vout] + args,
                    capture_output=True, text=True, timeout=60)
                out_text = open(vout).read() if os.path.exists(vout) \
                    else None
                cases.append(dict(vcf1=vcf1, vcf2=vcf2, args=args,
                                  rc=proc.returncode, output=out_text,
                                  stdout=proc.stdout))
            # concat (vcf2 unused; output unsorted in file order)
            vout = os.path.join(td, f"oc{pi}.vcf")
            proc = subprocess.run(
                [oracle, "-a", "concat", "-o", vout, "-1", p1, p2],
                capture_output=True, text=True, timeout=60)
            out_text = open(vout).read() if os.path.exists(vout) else None
            cases.append(dict(vcf1=vcf1, vcf2=vcf2,
                              args=["-a", "concat"], concat=True,
                              rc=proc.returncode, output=out_text,
                              stdout=proc.stdout))
    with open(out_json, "w") as fh:
        json.dump(cases, fh)
    npass = sum(1 for c in cases if c["rc"] == 0)
    print(f"wrote {out_json}: {len(cases)} cases ({npass} rc=0)")


if __name__ == "__main__":
    main()
