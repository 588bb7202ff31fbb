#!/usr/bin/env python3
"""Fuzzed VCFs x argument sets for the filter-subcommand differential.

--run <oracle_binary> <out.json>: generates the inputs, drives the
reference's main_filter file-to-file per case, and packs (input VCF,
args, output VCF, rc) into the golden JSON.
"""

import json
import os
import random
import subprocess
import sys
import tempfile

HEADER = """##fileformat=VCFv4.0
##fileDate=20260819
##source=lofreq_tpu-differential
##INFO=<ID=DP,Number=1,Type=Integer,Description="Raw Depth">
##INFO=<ID=AF,Number=1,Type=Float,Description="Allele Frequency">
##INFO=<ID=SB,Number=1,Type=Integer,Description="Phred-scaled strand bias at this position">
##INFO=<ID=DP4,Number=4,Type=Integer,Description="Counts for ref-forward bases, ref-reverse, alt-forward and alt-reverse bases">
##INFO=<ID=INDEL,Number=0,Type=Flag,Description="Indicates that the variant is an INDEL.">
##INFO=<ID=HRUN,Number=1,Type=Integer,Description="Homopolymer length to the right of report position">
#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO
"""

BASES = "ACGT"


def make_vcf(rng, n, indel_frac=0.25, qual_missing_frac=0.1,
             prefiltered_frac=0.15):
    rows = []
    pos = 0
    for _ in range(n):
        pos += rng.randrange(1, 500)
        ref = rng.choice(BASES)
        is_indel = rng.random() < indel_frac
        if is_indel:
            seq = "".join(rng.choice(BASES)
                          for _ in range(rng.randrange(1, 4)))
            if rng.random() < 0.5:
                refs, alts = ref, ref + seq
            else:
                refs, alts = ref + seq, ref
        else:
            refs = ref
            alts = rng.choice([b for b in BASES if b != ref])
        if rng.random() < qual_missing_frac:
            qual = "."
        else:
            qual = str(rng.randrange(0, 3000))
        filt = "."
        if rng.random() < prefiltered_frac:
            filt = rng.choice(["PASS", "min_dp_10", "sb_fdr"])
        dp = rng.randrange(1, 400)
        af = rng.random()
        sb = rng.choice([0, 0, 1, 3, 17, 60, 200, 2000])
        d4 = [rng.randrange(0, 200) for _ in range(4)]
        info = (f"DP={dp};AF={af:.6f};SB={sb};"
                f"DP4={d4[0]},{d4[1]},{d4[2]},{d4[3]}")
        if is_indel:
            info += f";INDEL;HRUN={rng.randrange(0, 9)}"
        rows.append(f"t1\t{pos + 1}\t.\t{refs}\t{alts}\t{qual}\t{filt}"
                    f"\t{info}")
    return HEADER + "\n".join(rows) + "\n"


ARG_SETS = [
    [],                                          # pure defaults
    ["--no-defaults"],
    ["--no-defaults", "-v", "20"],
    ["--no-defaults", "-V", "150"],
    ["--no-defaults", "-a", "0.05"],
    ["--no-defaults", "-A", "0.8"],
    ["--no-defaults", "-B", "60"],
    ["--no-defaults", "-b", "bonf", "-c", "0.05"],
    ["--no-defaults", "-b", "holm-bonf", "-c", "0.01"],
    ["--no-defaults", "-b", "fdr", "-c", "0.001"],
    ["--no-defaults", "-b", "fdr", "-c", "0.001", "--sb-incl-indels"],
    ["--no-defaults", "-b", "fdr", "-c", "0.001", "--sb-no-compound"],
    ["--no-defaults", "-Q", "30"],
    ["--no-defaults", "-q", "bonf", "-r", "0.05"],
    ["--no-defaults", "-q", "holm-bonf", "-r", "0.05", "-s", "5000"],
    ["--no-defaults", "-q", "fdr", "-r", "0.01"],
    ["--no-defaults", "-K", "40"],
    ["--no-defaults", "-k", "bonf", "-l", "0.05"],
    ["--no-defaults", "-k", "fdr", "-l", "0.01", "-m", "777"],
    ["--no-defaults", "--only-snvs"],
    ["--no-defaults", "--only-indels"],
    ["--print-all"],
    ["--no-defaults", "--print-all", "-q", "fdr", "-r", "0.05"],
    ["--no-defaults", "-v", "10", "-B", "60", "-Q", "20", "-K", "20"],
]


def main():
    assert sys.argv[1] == "--run"
    oracle, out_json = sys.argv[2], sys.argv[3]
    rng = random.Random(2026)
    vcfs = [make_vcf(rng, 60), make_vcf(rng, 25, indel_frac=0.0),
            make_vcf(rng, 25, indel_frac=1.0),
            make_vcf(rng, 120, qual_missing_frac=0.3),
            make_vcf(rng, 1)]
    cases = []
    with tempfile.TemporaryDirectory() as td:
        for vi, vcf_text in enumerate(vcfs):
            vin = os.path.join(td, f"in{vi}.vcf")
            with open(vin, "w") as fh:
                fh.write(vcf_text)
            for ai, args in enumerate(ARG_SETS):
                vout = os.path.join(td, f"out{vi}_{ai}.vcf")
                proc = subprocess.run(
                    [oracle, "-i", vin, "-o", vout] + args,
                    capture_output=True, text=True, timeout=60)
                out_text = None
                if os.path.exists(vout):
                    out_text = open(vout).read()
                cases.append(dict(vcf=vcf_text, args=args,
                                  rc=proc.returncode, output=out_text))
    with open(out_json, "w") as fh:
        json.dump(cases, fh)
    npass = sum(1 for c in cases if c["rc"] == 0)
    print(f"wrote {out_json}: {len(cases)} cases ({npass} rc=0)")


if __name__ == "__main__":
    main()
