#!/usr/bin/env python3
"""Golden generator for the bias-tool differential: run the
reference's lofreq2_bias.py UNMODIFIED (MB/BB/CB Mann-Whitney /
Fisher-combination numerics + MTC filtering, lofreq2_bias.py:190-350)
over fuzzed read-set x VCF x argset cases, through pure-data shims
(bias_shims/: pysam from a JSON sidecar, a minimal PyVCF, and a
sitecustomize pinning mannwhitneyu to the 2013 one-sided semantics the
script shipped against).

Usage: gen_bias_cases.py <out.json>   (needs /root/reference)
"""

import json
import os
import subprocess
import sys
import tempfile

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
SCRIPT = "/root/reference/src/tools/scripts/lofreq2_bias.py"
LOFREQ_STAR = "/root/reference/src/tools"
BASES = "ACGT"


def mk_reads(rng, chrom, glen, n, bias_sites):
    """Reads around each site; bias_sites: pos -> (alt, af, mq_shift,
    bq_shift) — alt reads get systematically shifted quals so the
    Mann-Whitney test has signal to find."""
    reads = []
    for i in range(n):
        rlen = int(rng.integers(30, 60))
        pos = int(rng.integers(0, glen - rlen))
        seq = [str(rng.choice(list(BASES))) for _ in range(rlen)]
        cig = f"{rlen}M"
        if rng.random() < 0.15 and rlen > 20:
            # split cigar with an indel so aligned_pairs walks I/D ops
            a = rlen // 2
            if rng.random() < 0.5:
                cig = f"{a}M2I{rlen - a - 2}M"
            else:
                cig = f"{a}M3D{rlen - a}M"
        mq = int(rng.integers(20, 60))
        bq = rng.integers(15, 40, rlen)
        is_alt = False
        for sp, (alt, af, mqs, bqs) in bias_sites.items():
            # query offset of sp given the cigar
            qoff = None
            q, r = 0, pos
            for ln, op in _ops(cig):
                if op in "M=X":
                    if r <= sp < r + ln:
                        qoff = q + (sp - r)
                    q += ln
                    r += ln
                elif op == "I":
                    q += ln
                elif op in "DN":
                    if r <= sp < r + ln:
                        qoff = None  # deletion over the site
                    r += ln
            if qoff is None:
                continue
            if rng.random() < af:
                seq[qoff] = alt
                is_alt = True
                mq = max(2, mq + mqs)
                bq[qoff] = max(3, min(41, bq[qoff] + bqs))
        flag = 0
        if rng.random() < 0.5:
            flag |= 16
        if rng.random() < 0.6:
            flag |= 1
            if rng.random() < 0.8:
                flag |= 2  # proper; rest are orphans
        r = rng.random()
        if r < 0.03:
            flag |= 4
        elif r < 0.06:
            flag |= 256
        elif r < 0.08:
            flag |= 1024
        elif r < 0.09:
            flag |= 512
        reads.append(dict(chrom=chrom, pos=pos, flag=flag, mapq=mq,
                          cigar=cig, seq="".join(seq),
                          qual="".join(chr(33 + int(v)) for v in bq)))
    reads.sort(key=lambda d: d["pos"])
    return reads


def _ops(s):
    out, n = [], ""
    for ch in s:
        if ch.isdigit():
            n += ch
        else:
            out.append((int(n), ch))
            n = ""
    return out


def mk_case(rng, idx, spec):
    glen = 300
    chrom = "b1"
    nsites = int(rng.integers(3, 8))
    sites = {}
    rows = []
    ref_at = {}
    for _ in range(nsites):
        p = int(rng.integers(20, glen - 20))
        if p in sites:
            continue
        ref = str(rng.choice(list(BASES)))
        alt = str(rng.choice([b for b in BASES if b != ref]))
        ref_at[p] = ref
        kind = rng.random()
        # some sites with strong bias (low alt quals), some unbiased
        if kind < 0.5:
            sites[p] = (alt, 0.3, -int(rng.integers(5, 25)),
                        -int(rng.integers(5, 15)))
        else:
            sites[p] = (alt, 0.4, 0, 0)
    for p in sorted(sites):
        alt, _af, _m, _b = sites[p]
        qual = str(rng.choice(["57", "1200", "."]))
        filt = str(rng.choice([".", "PASS", "min_dp_10"]))
        info = f"DP={int(rng.integers(20, 90))};AF=0.{rng.integers(100, 900)};SB=0"
        rows.append(f"{chrom}\t{p + 1}\t.\t{ref_at[p]}\t{alt}\t{qual}"
                    f"\t{filt}\t{info}")
    if spec.get("indel_row"):
        p = int(rng.integers(20, glen - 20))
        rows.append(f"{chrom}\t{p + 1}\t.\tA\tAT\t50\t.\tINDEL;DP=30")
        rows.sort(key=lambda l: int(l.split("\t")[1]))
    vcf = ("##fileformat=VCFv4.0\n##INFO=<ID=DP,Number=1,Type=Integer,"
           "Description=\"d\">\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER"
           "\tINFO\n" + "\n".join(rows) + "\n")
    reads = mk_reads(rng, chrom, glen, int(rng.integers(150, 400)), sites)
    return dict(name=f"bias{idx:02d}_{spec['tag']}", reads=reads,
                vcf=vcf, args=spec["args"])


def gen_cases():
    rng = np.random.default_rng(80808)
    specs = []

    def add(tag, n, args, **kw):
        for _ in range(n):
            specs.append(dict(tag=tag, args=args, **kw))

    add("fdr_bb", 5, [])                               # defaults
    add("bonf_mb", 3, ["-m", "bonf", "-t", "MB"])
    add("holmbonf_cb", 2, ["-m", "holmbonf", "-t", "CB"])
    add("fdr_cb_alpha", 2, ["-t", "CB", "--mtc-alpha", "0.05"])
    add("none", 2, ["-m", "None"])
    add("orphan", 2, ["-a"])
    add("quals", 2, ["--mq-filter", "30", "--bq-filter", "20"])
    add("pass_only", 2, ["-p"])
    add("indel_skip", 2, [], indel_row=True)
    return [mk_case(rng, i, s) for i, s in enumerate(specs)]


def run_script(case):
    with tempfile.TemporaryDirectory() as td:
        reads_json = os.path.join(td, "reads.json")
        with open(reads_json, "w") as fh:
            json.dump(case["reads"], fh)
        vin = os.path.join(td, "in.vcf")
        with open(vin, "w") as fh:
            fh.write(case["vcf"])
        out = os.path.join(td, "out.vcf")
        bam = os.path.join(td, "dummy.bam")
        open(bam, "wb").close()  # the script existence-checks it
        env = dict(
            os.environ,
            PYTHONPATH=os.path.join(HERE, "bias_shims"),
            READS_JSON=reads_json,
        )
        p = subprocess.run(
            [sys.executable, SCRIPT, "-b", bam, "-i", vin,
             "-o", out] + case["args"],
            capture_output=True, text=True, env=env, timeout=300)
        if p.returncode != 0:
            sys.stderr.write(p.stderr)
            raise SystemExit(f"bias script failed on {case['name']}")
        with open(out) as fh:
            return [l.rstrip("\n") for l in fh if not l.startswith("#")]


def main():
    out_json = sys.argv[1]
    cases = gen_cases()
    packed = []
    nrec = 0
    for case in cases:
        expected = run_script(case)
        nrec += len(expected)
        packed.append(dict(**case, expected=expected))
    with open(out_json, "w") as fh:
        json.dump(packed, fh)
    print(f"wrote {out_json}: {len(packed)} cases, {nrec} records")


if __name__ == "__main__":
    main()
